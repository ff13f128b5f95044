package graft.functions

/** Pure string-similarity kernels (called from codegen'd Catalyst
  * expressions and from tests). The reference ships
  * info.debatty:java-string-similarity in its pom but never calls it
  * (SURVEY.md §2.9) — the north rule adds batched Jaro-Winkler /
  * Levenshtein / Monge-Elkan scorers inside blocks; Levenshtein is a Spark
  * built-in, these provide the other two. Implemented from the textbook
  * definitions (Winkler boost 0.1, boost threshold 0.7, prefix cap 4),
  * value-identical to DuckDB's jaro_winkler_similarity (oracle-checked).
  */
object StringSim {

  def jaro(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    if (la == 1 && lb == 1) return if (a.charAt(0) == b.charAt(0)) 1.0 else 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true; matchedB(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mm = m.toDouble
    // half-transpositions floored (commons/DuckDB convention)
    (mm / la + mm / lb + (mm - (t / 2)) / mm) / 3.0
  }

  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var prefix = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (prefix < max && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  /** Monge-Elkan over whitespace tokens: mean over a's tokens of the max
    * Jaro-Winkler against b's tokens. Asymmetric by definition. */
  def mongeElkan(a: String, b: String): Double = {
    val as = a.split(" ").filter(_.nonEmpty)
    val bs = b.split(" ").filter(_.nonEmpty)
    if (as.isEmpty || bs.isEmpty) return 0.0
    var sum = 0.0
    var i = 0
    while (i < as.length) {
      var best = 0.0
      var j = 0
      while (j < bs.length) {
        val s = jaroWinkler(as(i), bs(j))
        if (s > best) best = s
        j += 1
      }
      sum += best
      i += 1
    }
    sum / as.length
  }
}
