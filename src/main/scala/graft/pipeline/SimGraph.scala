package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{BiDirectional, ElementKey, Hierarchy}

/** Stage 4c — element statistics over the full hierarchy (T-3 at
  * maxLevel=3) and the similarity-graph export (MainSimGraphGen + S-3
  * IO.writeSimilarityGraph).
  *
  * Scale design: element stats are plain per-key aggregations over the
  * df-bounded element vocabulary (tokens + codes + groups — small relative
  * to the pair table at any scale), so the key→df lookup is a broadcast
  * map-side join. The B-7 re-scorer carries each side's token array through
  * the pair table (J-5 "carry, don't re-join") and evaluates the pure
  * per-pair fold inside a typed map with hoisted per-partition state.
  */
object SimGraph {

  /** (kind, value, level, df) for levels 1..3.
    * level1 'T': REF_TKN edge counts; level2 'S': sum of member-token dfs
    * per phonetic code; level2 'N': same per nickname group; level3 'A':
    * sum of level-2 'S' dfs per first letter (NCK has no out-edges —
    * dao/edge/E.java:10-17 has no NCK_ABR type).
    *
    * `tokenDf`: pass a cached/checkpointed (token, df) table to avoid
    * recomputing it for each of the three level folds (the per-round stage
    * memoizer in Queries does this); default derives it from `tokens`. */
  def elementStats(tokens: DataFrame, tokenDf: Option[DataFrame] = None): DataFrame = {
    val spark = tokens.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val t1 = tokenDf.getOrElse(Blocking.tokenDf(tokens)) // (token, df)
    val sim = t1.groupBy(expr("graft_soundex(token)").as("value"))
      .agg(sum($"df").as("df"))
      .select(lit("S").as("kind"), $"value", lit(2).as("level"), $"df")
    val nickDf = graft.synth.NamePools.nicknameGroup.toSeq.toDF("token", "grp")
    val nck = t1.join(broadcast(nickDf), "token")
      .groupBy($"grp".as("value")).agg(sum($"df").as("df"))
      .select(lit("N").as("kind"), $"value", lit(2).as("level"), $"df")
    val abr = sim.groupBy(lower(substring($"value", 1, 1)).as("value"))
      .agg(sum($"df").as("df"))
      .select(lit("A").as("kind"), $"value", lit(3).as("level"), $"df")
    t1.select(lit("T").as("kind"), $"token".as("value"), lit(1).as("level"), $"df")
      .unionByName(sim).unionByName(nck).unionByName(abr)
  }

  /** Candidate pairs re-scored with the bi-directional hierarchical
    * similarity: (dst_id, org_id, common_cnt, bi_sim).
    *
    * `stats`: pass a cached [[elementStats]] table to reuse across queries;
    * default recomputes it from `tokens`.
    *
    * Scale shape (round-6 rewrite, guide §2.3/§2.4): `stats` is df-bounded
    * (|distinct tokens| + |codes| + |nick groups| + 26 — ~2k rows at
    * sf0.1, millions at 100 TB, vs billions of pair rows), so the WHOLE
    * key→df table rides an executor broadcast into the per-pair fold —
    * the same shape as the IVF centroid broadcast. The round-5 form
    * instead materialized a per-mention element-key/df ARRAY (a typed
    * flatMap + a broadcast-join + a second mention aggregation + a second
    * mention join) and carried four parallel arrays per pair side through
    * the candidate joins; all of that collapses into one global broadcast
    * lookup, leaving exactly two shuffles here (the mention token-array
    * aggregation and the candidate joins). Values are identical:
    * BiDirectional.sim only ever looks up keys lifted from the pair's own
    * tokens, and those keys' dfs are the same rows of `stats` the removed
    * join attached (missing keys cannot happen when stats and corpus
    * share one coder — the same invariant the array form relied on). */
  def rescoredPairs(tokens: DataFrame, candidates: DataFrame,
      stats: Option[DataFrame] = None): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val dfMap: Map[ElementKey, Long] =
      stats.getOrElse(elementStats(tokens))
        .select($"kind", $"value", $"level", $"df")
        .collect()
        .map(r => ElementKey(r.getInt(2), r.getString(0).charAt(0),
          r.getString(1)) -> r.getLong(3))
        .toMap
    val bc = spark.sparkContext.broadcast(dfMap)
    val mentionToks = tokens.groupBy($"mention_id")
      .agg(sort_array(collect_list(struct($"pos", $"token"))).as("pt"))
      .select($"mention_id", expr("transform(pt, x -> x.token)").as("toks"))
    candidates.select($"dst_id", $"org_id", $"common_cnt")
      .join(mentionToks.select($"mention_id".as("dst_id"), $"toks".as("dtoks")), "dst_id")
      .join(mentionToks.select($"mention_id".as("org_id"), $"toks".as("otoks")), "org_id")
      .select($"dst_id", $"org_id", $"common_cnt", $"dtoks", $"otoks")
      .as[(Long, Long, Int, Seq[String], Seq[String])]
      .mapPartitions { it =>
        // hoisted per-partition: the hierarchy (JVM-wide lazy val) and the
        // broadcast df map (read once per task, shared across rows)
        val h = Hierarchy.default
        val df = bc.value
        it.map { case (dstId, orgId, commonCnt, dtoks, otoks) =>
          (dstId, orgId, commonCnt, BiDirectional.sim(h, otoks, dtoks, df))
        }
      }
      .toDF("dst_id", "org_id", "common_cnt", "bi_sim")
  }

  /** The S-3 edges sink: one row per unordered surviving pair,
    * (source, target, weight, common_token_cnt) — IO.java:48-56. The two
    * directed scores sum identical terms in different fold orders, so they
    * can differ in the last ulp; min() (not an arbitrary dropDuplicates
    * pick) keeps the output — and the oracle compare — deterministic. */
  def simGraphEdges(tokens: DataFrame, candidates: DataFrame,
      stats: Option[DataFrame] = None): DataFrame =
    rescoredPairs(tokens, candidates, stats)
      .select(least(col("dst_id"), col("org_id")).as("source"),
        greatest(col("dst_id"), col("org_id")).as("target"),
        round(col("bi_sim"), 6).as("w"),
        col("common_cnt"))
      .groupBy(col("source"), col("target"))
      .agg(min(col("w")).as("weight"),
        min(col("common_cnt")).as("common_token_cnt"))

  /** The S-3 vertices sink: (id, label, weight, res_id) — IO.java:40-47;
    * res_id = first gold id of the name (min for determinism). */
  def simGraphVertices(mentions: DataFrame, gold: DataFrame): DataFrame =
    mentions.join(gold, "name")
      .groupBy(col("mention_id").as("id"), col("name").as("label"),
        col("weight"))
      .agg(min(col("entity_id")).as("res_id"))

  // ---------------------------------------------------------------- oracle

  /** American Soundex of a (lowercase alpha) SQL expression as a pure
    * DuckDB `list_reduce` fold — acc = 'digits~prevCode'; h/w carry the
    * previous code, vowels/y reset it, consecutive equal codes collapse. */
  def soundexSql(col: String): String = {
    def d(c: String) =
      s"""(CASE WHEN instr('bfpv', $c)>0 THEN '1'
         |      WHEN instr('cgjkqsxz', $c)>0 THEN '2'
         |      WHEN instr('dt', $c)>0 THEN '3'
         |      WHEN $c='l' THEN '4'
         |      WHEN instr('mn', $c)>0 THEN '5'
         |      WHEN $c='r' THEN '6' ELSE '0' END)""".stripMargin
    s"""upper(($col)[1]) || substr(split_part(list_reduce(
       |      list_prepend('~' || ${d(s"($col)[1]")},
       |        [x FOR x IN string_split(substr($col, 2), '') IF x <> '']),
       |      (acc, c) -> CASE
       |        WHEN c='h' OR c='w' THEN acc
       |        WHEN ${d("c")} = '0' THEN split_part(acc,'~',1) || '~0'
       |        WHEN ${d("c")} = split_part(acc,'~',2) THEN acc
       |        ELSE split_part(acc,'~',1) || ${d("c")} || '~' || ${d("c")}
       |      END), '~', 1) || '000', 1, 3)""".stripMargin
  }

  /** DuckDB CTEs mirroring [[elementStats]] — Soundex via [[soundexSql]],
    * the nickname map inlined as VALUES. Append after Blocking.ctes. */
  val elementStatsCtes: String = {
    val nickRows = graft.synth.NamePools.nicknameGroup.toSeq.sorted
      .map { case (t, g) => s"('$t','$g')" }.mkString(", ")
    s"""sdx AS (
       |  SELECT token, ${soundexSql("token")} AS code
       |  FROM token_df
       |),
       |nick_map AS (SELECT * FROM (VALUES $nickRows) AS t(token, grp)),
       |elem_s AS (
       |  SELECT 'S' AS kind, s.code AS value, 2 AS level, sum(d.df)::BIGINT AS df
       |  FROM token_df d JOIN sdx s USING (token) GROUP BY 2
       |),
       |elem_n AS (
       |  SELECT 'N' AS kind, n.grp AS value, 2 AS level, sum(d.df)::BIGINT AS df
       |  FROM token_df d JOIN nick_map n USING (token) GROUP BY 2
       |),
       |elem_a AS (
       |  SELECT 'A' AS kind, lower(substr(value, 1, 1)) AS value, 3 AS level,
       |         sum(df)::BIGINT AS df
       |  FROM elem_s GROUP BY 2
       |),
       |element_stats AS (
       |  SELECT 'T' AS kind, token AS value, 1 AS level, df::BIGINT AS df
       |  FROM token_df
       |  UNION ALL SELECT kind, value, level, df FROM elem_s
       |  UNION ALL SELECT kind, value, level, df FROM elem_n
       |  UNION ALL SELECT kind, value, level, df FROM elem_a
       |)""".stripMargin
  }

  /** DuckDB CTEs mirroring [[simGraphEdges]] (the B-7 bi-directional
    * level walk). Append after [[elementStatsCtes]].
    *
    * Bit-exactness: floating-point addition is order-sensitive, so the
    * oracle reproduces the Scala fold EXACTLY — each matched key
    * contributes `(1.0/df) * min(cntO, cntD)` (same op order as
    * BiDirectional.sim), and per-pair terms are summed with a sequential
    * `list_reduce` fold ordered by (level, org-side first-token position,
    * S-before-N) — provably the LinkedHashMap insertion order of the
    * Scala walk (collapsed keys keep their first inserter's position;
    * same-token S is inserted before its N; later tokens only append). */
  val simEdgesCtes: String =
    """sg_l1 AS (
      |  SELECT c.dst_id, c.org_id, 'o' AS side, t.token AS value,
      |         count(*)::BIGINT AS cnt, min(t.pos) AS fp
      |  FROM candidates c JOIN tokens t ON t.mention_id = c.org_id
      |  GROUP BY 1, 2, 4
      |  UNION ALL
      |  SELECT c.dst_id, c.org_id, 'd', t.token, count(*)::BIGINT, min(t.pos)
      |  FROM candidates c JOIN tokens t ON t.mention_id = c.dst_id
      |  GROUP BY 1, 2, 4
      |),
      |sg_m1 AS (
      |  SELECT o.dst_id, o.org_id, 'T' AS kind, o.value,
      |         least(o.cnt, d.cnt) AS mc, o.fp, 1 AS lvl, 0 AS kord
      |  FROM sg_l1 o JOIN sg_l1 d
      |    ON o.dst_id = d.dst_id AND o.org_id = d.org_id AND o.value = d.value
      |   AND o.side = 'o' AND d.side = 'd'
      |),
      |sg_rem1 AS (
      |  SELECT s.* FROM sg_l1 s
      |  LEFT JOIN sg_m1 m ON m.dst_id = s.dst_id AND m.org_id = s.org_id
      |                   AND m.value = s.value
      |  WHERE m.value IS NULL
      |),
      |sg_l2 AS (
      |  SELECT r.dst_id, r.org_id, r.side, 'S' AS kind, x.code AS value,
      |         sum(r.cnt)::BIGINT AS cnt, min(r.fp) AS fp
      |  FROM sg_rem1 r JOIN sdx x ON x.token = r.value
      |  GROUP BY 1, 2, 3, 5
      |  UNION ALL
      |  SELECT r.dst_id, r.org_id, r.side, 'N', n.grp,
      |         sum(r.cnt)::BIGINT, min(r.fp)
      |  FROM sg_rem1 r JOIN nick_map n ON n.token = r.value
      |  GROUP BY 1, 2, 3, 5
      |),
      |sg_m2 AS (
      |  SELECT o.dst_id, o.org_id, o.kind, o.value,
      |         least(o.cnt, d.cnt) AS mc, o.fp, 2 AS lvl,
      |         CASE WHEN o.kind = 'S' THEN 0 ELSE 1 END AS kord
      |  FROM sg_l2 o JOIN sg_l2 d
      |    ON o.dst_id = d.dst_id AND o.org_id = d.org_id
      |   AND o.kind = d.kind AND o.value = d.value
      |   AND o.side = 'o' AND d.side = 'd'
      |),
      |sg_rem2 AS (
      |  SELECT s.* FROM sg_l2 s
      |  LEFT JOIN sg_m2 m ON m.dst_id = s.dst_id AND m.org_id = s.org_id
      |                   AND m.kind = s.kind AND m.value = s.value
      |  WHERE m.value IS NULL
      |),
      |sg_l3 AS (
      |  SELECT dst_id, org_id, side, 'A' AS kind,
      |         lower(substr(value, 1, 1)) AS value,
      |         sum(cnt)::BIGINT AS cnt, min(fp) AS fp
      |  FROM sg_rem2 WHERE kind = 'S'
      |  GROUP BY 1, 2, 3, 5
      |),
      |sg_m3 AS (
      |  SELECT o.dst_id, o.org_id, o.kind, o.value,
      |         least(o.cnt, d.cnt) AS mc, o.fp, 3 AS lvl, 0 AS kord
      |  FROM sg_l3 o JOIN sg_l3 d
      |    ON o.dst_id = d.dst_id AND o.org_id = d.org_id AND o.value = d.value
      |   AND o.side = 'o' AND d.side = 'd'
      |),
      |sg_contrib AS (
      |  SELECT m.dst_id, m.org_id, m.lvl, m.fp, m.kord,
      |         (1.0::DOUBLE / st.df) * m.mc AS term
      |  FROM (SELECT * FROM sg_m1 UNION ALL
      |        SELECT * FROM sg_m2 UNION ALL
      |        SELECT * FROM sg_m3) m
      |  JOIN element_stats st ON st.kind = m.kind AND st.value = m.value
      |),
      |sg_pair_sim AS (
      |  SELECT c.dst_id, c.org_id, c.common_cnt, coalesce(x.bi, 0.0::DOUBLE) AS bi_sim
      |  FROM candidates c LEFT JOIN (
      |    SELECT dst_id, org_id,
      |           list_reduce(list(term ORDER BY lvl, fp, kord),
      |                       (a, b) -> a + b) AS bi
      |    FROM sg_contrib GROUP BY 1, 2
      |  ) x ON c.dst_id = x.dst_id AND c.org_id = x.org_id
      |),
      |sim_edges AS (
      |  SELECT source, target, min(w) AS weight,
      |         min(common_cnt) AS common_token_cnt
      |  FROM (
      |    SELECT least(dst_id, org_id) AS source,
      |           greatest(dst_id, org_id) AS target,
      |           round(bi_sim, 6) AS w, common_cnt
      |    FROM sg_pair_sim
      |  ) GROUP BY 1, 2
      |)""".stripMargin
}
