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
  * Scale design (round-6 shape; value-identical to [[candidatesNaive]],
  * which the DuckDB oracle computes — every Verify run re-proves the
  * equivalence):
  *  1. ONE aggregation builds the per-mention sorted token/df array
  *     ([[tokenArrays]]); self-similarity, the PREFIX-FILTER boundary
  *     (the exact-equivalence pruning of set-similarity joins, adapted to
  *     the relative threshold) and the verification arrays are all derived
  *     from it as per-row expressions — the round-5 shape derived each of
  *     them from its own aggregation over a rebuilt `scored` subtree, which
  *     planned 14 scans of the tokens input and 7 distinct/df aggregations
  *     (guide §2.4: remove shuffles outright; measured plan in
  *     plans/r06/blocking_from_parquet_before.txt).
  *  2. The dst side explodes ONLY its prefix tokens (sorted rarest-first,
  *     minimal suffix mass >= relSimTh * selfSim — pairs reachable only
  *     via the remaining tokens are provably below threshold); the org
  *     side explodes all (cap-surviving) tokens. The single token join is
  *     therefore dst-prefix x full-org, as before.
  *  3. Pair dedup (a pair can collide on several prefix tokens) happens
  *     IN-ROW — a pair survives only at the dst's FIRST prefix token
  *     shared with the org (same trick as Similarity.annCandidates'
  *     first-shared-table rule) — and the exact (sum_sim, common_cnt)
  *     verification runs on the carried arrays of the surviving row. The
  *     round-5 shape instead shuffled the full emitted pair multiset into
  *     a distinct() and then re-attached both token arrays through two
  *     more hash joins; after this rewrite NOTHING downstream of the token
  *     join shuffles at all (guide §2.3: shuffle fewer bytes — the arrays
  *     ride the token join once instead of the pair set riding three
  *     exchanges).
  *
  * The two join inputs derive from the SAME [[tokenArrays]] plan (same
  * projected columns), so the mention-side aggregation exchange is planned
  * once and reused (ReuseExchange) instead of recomputed per branch.
  * `maxBlockDf` remains the algorithmic stop-key valve (tokens more
  * frequent than the cap contribute at most maxDf * (1/df) ~ negligible
  * score mass but O(df^2) pairs).
  *
  * Floating-point note: sum_sim / self_sim / suffix-mass folds run in the
  * deterministic (df asc, token asc) array order — a DIFFERENT summation
  * order than round 5's shuffle-arrival aggregations, covered by exactly
  * the tolerance that already covers the DuckDB oracle's own arbitrary
  * summation order: the [[eps]] guard on every threshold compare and the
  * 6-dp rounding of the published columns.
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

  /** Per-mention sorted token/df array: (mention_id, ts) with ts sorted by
    * (df asc, token asc) — the single aggregation every downstream
    * derivation (self-sim, prefix boundary, verification arrays) reads.
    * (df asc) IS the window order (sim desc) of the round-5 shape: sim =
    * 1/df, so equal sims are exactly equal dfs. The array_distinct
    * reproduces `scored`'s DISTINCT (mention, token) without its extra
    * (mention_id, token) exchange: duplicates are adjacent after the sort
    * and collapse to one entry. */
  private[graft] def tokenArrays(tokens: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(tokens.sparkSession)
    tokens.select(col("mention_id"), col("token"))
      .join(tokenDf(tokens), "token")
      .groupBy(col("mention_id"))
      .agg(expr("graft_block_sort(collect_list(struct(df, token)))").as("ts"))
  }

  /** The deduped directed pair stream with everything the verification
    * needs carried in-row plus the verdict itself: (token, dst_id,
    * self_sim, v = (common_cnt, sum_sim)) — one row per surviving
    * (dst, org) pair (dedup rule inside graft_block_pair: the dst's first
    * prefix token shared with the org; the per-row array work runs in the
    * codegen'd blocking kernels, not interpreted HOF lambdas). The
    * suffix-mass fold that fixes the prefix boundary (graft_block_dst)
    * runs per element from 0.0 in array order — bit-identical to the
    * round-5 UnboundedFollowing window frame, which also recomputed the
    * sum per row from the current row to the partition end in (sim desc,
    * token asc) order. */
  private def pairStream(tokens: DataFrame, cfg: Config): DataFrame = {
    val arr = tokenArrays(tokens)
    val maxDf = cfg.maxBlockDf.getOrElse(-1L)
    val dst = arr.select(
        col("mention_id").as("dst_id"),
        expr(s"graft_block_dst(ts, ${maxDf}L, ${cfg.relSimTh}D)").as("d"))
      .select(col("dst_id"), col("d.tsc").as("tsc"),
        col("d.self_sim").as("self_sim"), col("d.plen").as("plen"))
      .select(col("dst_id"), col("tsc"), col("self_sim"), col("plen"),
        explode(expr("slice(graft_block_toks(tsc, -1L), 1, plen)")).as("token"))
    val org = arr.select(
        col("mention_id").as("org_id"),
        expr(s"graft_block_toks(ts, ${maxDf}L)").as("otoks"))
      .select(col("org_id"), col("otoks"), explode(col("otoks")).as("token"))
    // shuffle-hash: the two exploded streams are large and unsorted; hash
    // joins skip the two O(n log n) sorts a sort-merge join would add
    dst.hint("SHUFFLE_HASH").join(org.hint("SHUFFLE_HASH"), "token")
      .filter(col("dst_id") =!= col("org_id"))
      .withColumn("v", expr("graft_block_pair(tsc, plen, otoks, token)"))
      .filter(col("v").isNotNull)
      .select(col("dst_id"), col("org_id"), col("self_sim"), col("v"))
  }

  /** Surviving non-self candidate pairs (directed: thresholds are relative
    * to the destination's self-similarity). Output is value-identical to
    * [[candidatesNaive]] (the DuckDB oracle computes the naive form, so
    * every Verify run re-proves the equivalence). */
  def candidates(tokens: DataFrame, cfg: Config = Config()): DataFrame =
    pairStream(tokens, cfg)
      .withColumn("common_cnt", col("v.common_cnt"))
      .withColumn("sum_sim", col("v.sum_sim"))
      .filter(col("common_cnt") >= cfg.commonMsgTh &&
        col("sum_sim") >= lit(cfg.relSimTh) * col("self_sim") - lit(eps))
      .select(col("dst_id"), col("org_id"), col("common_cnt"),
        col("sum_sim"), col("self_sim"))

  /** The distinct directed pair set the prefix join emits (the pairs the
    * engine actually scores — also the benchmark throughput numerator;
    * applies the stop-key valve exactly like [[candidates]]: capped tokens
    * are excluded from pair generation, self-similarity keeps all
    * tokens). */
  def scoredPairs(tokens: DataFrame, cfg: Config = Config()): DataFrame =
    pairStream(tokens, cfg).select(col("dst_id"), col("org_id"))

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
