package graft.engine

import scala.collection.mutable

/** B-7: the bi-directional hierarchical set-similarity re-scorer of
  * MainSimGraphGen.java:39-66. For each candidate pair, lift both token
  * multisets level by level (1..3); at each level every common element key
  * contributes (1/df(key)) * min(multiplicityA, multiplicityB) and is then
  * removed from both sides (so a token matched at a lower level never
  * re-scores via its lifted keys — except through its OTHER same-level key
  * paths, e.g. the nickname group when the phonetic group matched, exactly
  * like the reference's per-key removal). */
object BiDirectional {

  /** Multiplicity sets carry token slot indices (the reference's distinct
    * TokenE objects). df is keyed by element; missing keys are skipped
    * (cannot happen when stats and corpus share one coder). */
  def sim(
      h: Hierarchy,
      orgToks: Seq[String],
      dstToks: Seq[String],
      df: collection.Map[ElementKey, Long]): Double = {

    def init(toks: Seq[String]) = {
      val m = mutable.LinkedHashMap.empty[ElementKey, mutable.LinkedHashSet[Int]]
      toks.zipWithIndex.foreach { case (t, i) =>
        m.getOrElseUpdate(h.tokenKey(t), mutable.LinkedHashSet.empty[Int]) += i
      }
      m
    }
    var org = init(orgToks)
    var dst = init(dstToks)

    var simSum = 0.0
    var level = 1
    while (level <= h.maxLevel) {
      org = h.liftAtLeast(org, level)
      dst = h.liftAtLeast(dst, level)
      val toRemove = mutable.ArrayBuffer.empty[ElementKey]
      for ((k, orgSet) <- org if dst.contains(k)) {
        df.get(k).foreach { d =>
          simSum += (1.0 / d) * math.min(orgSet.size, dst(k).size)
        }
        toRemove += k
      }
      toRemove.foreach { k => org -= k; dst -= k }
      level += 1
    }
    simSum
  }
}
