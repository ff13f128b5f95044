package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 3+4 — token statistics, blocking (candidate generation) and
  * soft-TF-IDF scoring.
  *
  * Reference analogues:
  *  - token df = ElementV.clusterCount at maxLevel=1
  *    (dao/G.java:324-341, Main.java:25);
  *  - one-hop message passing out(REF_TKN) / in(REF_TKN): one message per
  *    DISTINCT (mention, token) with sim = 1/df(token)
  *    (logic/MessagePassing.java:46-78);
  *  - candidate aggregation + thresholds `aggRefVsTerminal(1, 0.5f)`:
  *    common_cnt = |sharedTokens|, sum_sim = sum 1/df over shared tokens,
  *    keep when sum_sim >= relSimTh * selfSim(dst) and common_cnt >=
  *    commonMsgTh (logic/MessagePassing.java:80-107). The reference's
  *    ">1 candidate" gate always contains the self candidate, so it reduces
  *    to "at least one surviving non-self candidate" — i.e. the surviving
  *    non-self pair set itself.
  *
  * Scale design: the self-join on `token` is THE heavy shuffle (SURVEY.md
  * J-1). `scored` is already hash-partitioned by token from the df join, so
  * Catalyst reuses the exchange for the self-join; AQE handles skewed
  * blocks; `maxBlockDf` is the algorithmic stop-key valve (tokens more
  * frequent than the cap contribute at most maxDf * (1/df) ~ negligible
  * score mass but O(df^2) pairs).
  */
object Blocking {

  final case class Config(
      commonMsgTh: Int = 1,
      relSimTh: Double = 0.5,
      /** Stop-key cap: tokens with df above this are excluded from PAIR
        * GENERATION (they still count in self-similarity). None = exact
        * reference semantics. */
      maxBlockDf: Option[Long] = None)

  /** Float-comparison guard so borderline relative-threshold decisions are
    * identical across engines/summation orders. */
  val eps = 1e-12

  /** Token document frequency — one count per REF_TKN edge (token slot),
    * matching G.updateAncestorClusterCnt(1). */
  def tokenDf(tokens: DataFrame): DataFrame =
    tokens.groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** One row per DISTINCT (mention, token) with its 1/df score — the
    * message set of the out/in hop (V.getOutV dedups neighbors). */
  def scored(tokens: DataFrame): DataFrame =
    tokens.select(col("mention_id"), col("token")).distinct()
      .join(tokenDf(tokens), "token")
      .withColumn("sim", lit(1.0) / col("df"))

  /** Per-mention self-similarity: sum of 1/df over its own distinct tokens
    * (the messages a mention sends to itself, MessagePassing.java:103-107).
    */
  def selfSim(scored: DataFrame): DataFrame =
    scored.groupBy(col("mention_id")).agg(sum(col("sim")).as("self_sim"))

  /** Surviving non-self candidate pairs (directed: thresholds are relative
    * to the destination's self-similarity).
    *
    * Implementation: PREFIX FILTERING (the exact-equivalence pruning of
    * set-similarity joins, adapted to the relative threshold). For a
    * destination mention with tokens sorted rarest-first, any surviving
    * pair must share at least one token of the minimal prefix whose
    * running suffix mass >= relSimTh * selfSim — pairs reachable only via
    * the remaining common tokens are provably below threshold. The join
    * therefore runs dst-prefix x full-org (orders of magnitude fewer
    * generated rows than the naive token self-join on skewed corpora),
    * and exact (sum_sim, common_cnt) verification happens on the carried
    * token arrays of the surviving pair table — no pair-granularity
    * shuffle of the full block cross products. Output is value-identical
    * to [[candidatesNaive]] (the DuckDB oracle computes the naive form,
    * so every Verify run re-proves the equivalence).
    */
  def candidates(tokens: DataFrame, cfg: Config = Config()): DataFrame = {
    val sc0 = scored(tokens)
    val sc = cfg.maxBlockDf.fold(sc0)(cap => sc0.filter(col("df") <= cap))
    val self = selfSim(sc0).withColumnRenamed("mention_id", "m")
    val pairs = prefixPairs(sc, self, cfg)

    val tokArr = sc.groupBy(col("mention_id"))
      .agg(collect_list(struct(col("token"), col("sim"))).as("ts"))
      .join(self, col("mention_id") === col("m")).drop("m")

    // shuffle-hash hints: the pair table is large and unsorted; hash joins
    // skip the two O(pairs log pairs) sorts a sort-merge join would add.
    pairs
      .join(tokArr.select(col("mention_id").as("dst_id"), col("ts").as("dts"),
        col("self_sim")).hint("SHUFFLE_HASH"), "dst_id")
      .join(tokArr.select(col("mention_id").as("org_id"),
        expr("transform(ts, x -> x.token)").as("otoks")).hint("SHUFFLE_HASH"), "org_id")
      .withColumn("shared", expr("filter(dts, x -> array_contains(otoks, x.token))"))
      .withColumn("common_cnt", size(col("shared")))
      .withColumn("sum_sim", expr("aggregate(shared, 0D, (acc, x) -> acc + x.sim)"))
      .filter(col("common_cnt") >= cfg.commonMsgTh &&
        col("sum_sim") >= lit(cfg.relSimTh) * col("self_sim") - lit(eps))
      .select(col("dst_id"), col("org_id"), col("common_cnt"),
        col("sum_sim"), col("self_sim"))
  }

  /** The distinct directed pair set the prefix join emits (the pairs the
    * engine actually scores — also the benchmark throughput numerator). */
  def prefixPairs(sc: DataFrame, self: DataFrame, cfg: Config): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("mention_id"))
      .orderBy(col("sim").desc, col("token").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prefix = sc
      .join(self, sc("mention_id") === self("m")).drop("m")
      .withColumn("suffix_mass", sum(col("sim")).over(win))
      .filter(col("suffix_mass") >= lit(cfg.relSimTh) * col("self_sim") - lit(eps))
    prefix.select(col("mention_id").as("dst_id"), col("token"))
      .join(sc.select(col("mention_id").as("org_id"), col("token"))
        .hint("SHUFFLE_HASH"), "token")
      .filter(col("dst_id") =!= col("org_id"))
      .select(col("dst_id"), col("org_id"))
      .distinct()
  }

  /** Convenience for benchmarking: pairs scored on a tokens table (applies
    * the stop-key valve exactly like [[candidates]]: capped tokens are
    * excluded from pair generation, self-similarity keeps all tokens). */
  def scoredPairs(tokens: DataFrame, cfg: Config = Config()): DataFrame = {
    val sc0 = scored(tokens)
    val sc = cfg.maxBlockDf.fold(sc0)(cap => sc0.filter(col("df") <= cap))
    prefixPairs(sc, selfSim(sc0).withColumnRenamed("mention_id", "m"), cfg)
  }

  /** Reference-shaped naive blocking (full token self-join + pair
    * aggregation). Used by tests to prove prefix-filter equivalence. */
  def candidatesNaive(tokens: DataFrame, cfg: Config = Config()): DataFrame = {
    val sc = scored(tokens).cache()
    val joinSide = cfg.maxBlockDf.fold(sc)(cap => sc.filter(col("df") <= cap))
    val pairs = joinSide.as("a").join(joinSide.as("b"), "token")
      .filter(col("a.mention_id") =!= col("b.mention_id"))
      .groupBy(col("a.mention_id").as("dst_id"), col("b.mention_id").as("org_id"))
      .agg(count(lit(1)).cast("int").as("common_cnt"), sum(col("a.sim")).as("sum_sim"))
    pairs
      .join(selfSim(sc).withColumnRenamed("mention_id", "dst_id"), "dst_id")
      .filter(col("common_cnt") >= cfg.commonMsgTh &&
        col("sum_sim") >= lit(cfg.relSimTh) * col("self_sim") - lit(eps))
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB CTEs: token_df, scored, self_sim, candidates. Append after
    * Tokenize.ctes. */
  val ctes: String =
    """token_df AS (
      |  SELECT token, count(*) AS df FROM tokens GROUP BY token
      |),
      |scored AS (
      |  SELECT m.mention_id, m.token, d.df, 1.0 / d.df AS sim
      |  FROM (SELECT DISTINCT mention_id, token FROM tokens) m
      |  JOIN token_df d USING (token)
      |),
      |self_sim AS (
      |  SELECT mention_id, sum(sim) AS self_sim FROM scored GROUP BY mention_id
      |),
      |candidates AS (
      |  SELECT p.dst_id, p.org_id, p.common_cnt, p.sum_sim, s.self_sim
      |  FROM (
      |    SELECT a.mention_id AS dst_id, b.mention_id AS org_id,
      |           count(*)::INT AS common_cnt, sum(a.sim) AS sum_sim
      |    FROM scored a JOIN scored b USING (token)
      |    WHERE a.mention_id <> b.mention_id
      |    GROUP BY 1, 2
      |  ) p
      |  JOIN self_sim s ON p.dst_id = s.mention_id
      |  WHERE p.common_cnt >= 1 AND p.sum_sim >= 0.5 * s.self_sim - 1e-12
      |)""".stripMargin
}
