package graft.synth

/** Shared, deterministic name pools used by BOTH the Spark-side synthetic
  * transcript generator and the DuckDB oracle SQL builder. Keeping a single
  * source of truth guarantees the two engines generate byte-identical corpora.
  *
  * The variation phenomena mirror the reference corpus characteristics
  * (abbreviation-to-initial, nickname substitution, phonetically-equivalent
  * misspelling, token reorder, suffix noise) described in
  * /root/reference README.md and exercised by
  * matching/src/main/java/logic/matching/MatchResult.java:157-214.
  */
object NamePools {

  /** 40 first names; index = c_custkey % 40. */
  val first: Vector[String] = Vector(
    "james", "john", "robert", "michael", "william", "david", "richard",
    "joseph", "thomas", "charles", "christopher", "daniel", "matthew",
    "anthony", "mark", "donald", "steven", "paul", "andrew", "joshua",
    "mary", "patricia", "jennifer", "linda", "elizabeth", "barbara",
    "susan", "jessica", "sarah", "karen", "nancy", "lisa", "betty",
    "margaret", "sandra", "ashley", "kimberly", "emily", "donna",
    "michelle")

  /** Nickname aligned to `first` by index (self when no common nickname). */
  val nickOfFirst: Vector[String] = Vector(
    "jim", "jack", "bob", "mike", "bill", "dave", "dick",
    "joe", "tom", "chuck", "chris", "dan", "matt",
    "tony", "mark", "don", "steve", "paul", "andy", "josh",
    "mary", "pat", "jen", "linda", "liz", "barb",
    "sue", "jess", "sally", "karen", "nan", "lisa", "betty",
    "peggy", "sandy", "ash", "kim", "em", "donna",
    "shelly")

  /** 20 middle names; index = (c_custkey div 3) % 20. */
  val middle: Vector[String] = Vector(
    "lee", "ann", "marie", "lynn", "ray", "jay", "dean", "grace",
    "rose", "jane", "kay", "beth", "claire", "june", "hope", "faith",
    "blake", "reed", "quinn", "sage")

  /** 60 last names; index = (c_custkey div 7) % 60. */
  val last: Vector[String] = Vector(
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "taylor", "moore", "jackson", "martin",
    "thompson", "white", "harris", "sanchez", "clark", "ramirez", "lewis",
    "robinson", "walker", "young", "allen", "king", "wright", "scott",
    "torres", "nguyen", "hill", "flores", "green", "adams", "nelson",
    "baker", "hall", "rivera", "campbell", "mitchell", "carter",
    "roberts", "gomez", "phillips", "evans", "turner", "diaz", "parker",
    "cruz", "edwards", "collins", "reyes", "stewart", "morris", "morales")

  /** Same-Soundex misspelling aligned to `last` by index (self when none).
    * A unit test asserts soundex equality pair-by-pair. */
  val misspellOfLast: Vector[String] = Vector(
    "smyth", "jonson", "willyams", "braun", "joans", "garsia", "muller",
    "davies", "rodrigues", "martines", "hernandes", "lopes", "gonzales",
    "willson", "andersen", "tailor", "mohr", "jaxon", "marten",
    "tompson", "white", "harris", "sanchez", "clark", "ramirez", "lewis",
    "robinson", "walker", "young", "allen", "king", "wright", "scott",
    "torres", "nguyen", "hill", "flores", "green", "adams", "nelson",
    "baker", "hall", "rivera", "campbell", "mitchell", "carter",
    "roberts", "gomez", "phillips", "evans", "turner", "diaz", "parker",
    "cruz", "edwards", "collins", "reyes", "stewart", "morris", "morales")

  /** Last-name suffixes: composed as base||suffix, expanding the distinct
    * last-name space to 600 so per-last homonym density matches the
    * reference corpora (arXiv: 12,863 distinct names, mostly unique
    * surnames) instead of a 60-name pool's 25-way pile-ups. Suffixing both
    * the base and its misspelling preserves Soundex equality (unit-tested).
    */
  val lastSuffix: Vector[String] = Vector(
    "", "son", "sen", "man", "berg", "ton", "field", "wood", "stein", "ford")

  /** Second suffix layer: vowel-only endings (zero Soundex impact), giving
    * 60 x 10 x 10 = 6000 distinct last names so homonym density stays in
    * the reference corpora's band as the corpus scales (arXiv ~1
    * entity/surname, DBLP ~3) instead of piling 25 entities per surname
    * at sf0.1. */
  val lastSuffix2: Vector[String] = Vector(
    "", "a", "e", "i", "o", "u", "y", "ia", "io", "ea")

  /** token -> canonical nickname-group id (level-2 NCK element, analogue of
    * the reference's NICKNAME vertices, dao/vertex/V.java:25). Both the
    * formal name and its nickname map to the formal name's group. */
  val nicknameGroup: Map[String, String] = {
    val pairs = first.zip(nickOfFirst)
    (pairs.map { case (f, _) => f -> f } ++
      pairs.collect { case (f, n) if n != f => n -> f }).toMap
  }

  /** Render a pool as a DuckDB list literal, e.g. ['james', 'john', ...]. */
  def sqlList(pool: Vector[String]): String =
    pool.mkString("['", "', '", "']")
}
