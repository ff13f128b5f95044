package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{BiDirectional, ElementKey, Hierarchy}

/** Stage 4c — element statistics over the full hierarchy (T-3 at
  * maxLevel=3) and the similarity-graph export (MainSimGraphGen + S-3
  * IO.writeSimilarityGraph).
  *
  * Scale design: element stats are plain per-key aggregations. The B-7
  * re-scorer carries each side's token array through the pair table (J-5
  * "carry, don't re-join") and evaluates the pure per-pair fold inside a
  * typed map; the per-element dfs are collected per mention as a small
  * (key, df) array via one explode + join + re-collect, so no driver-side
  * state and no broadcast of the full stats table is needed.
  */
object SimGraph {

  /** (kind, value, level, df) for levels 1..3.
    * level1 'T': REF_TKN edge counts; level2 'S': sum of member-token dfs
    * per phonetic code; level2 'N': same per nickname group; level3 'A':
    * sum of level-2 'S' dfs per first letter (NCK has no out-edges —
    * dao/edge/E.java:10-17 has no NCK_ABR type). */
  def elementStats(tokens: DataFrame): DataFrame = {
    val spark = tokens.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val t1 = Blocking.tokenDf(tokens) // (token, df)
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

  case class MentionElems(mention_id: Long, toks: Seq[String],
      kinds: Seq[String], values: Seq[String], dfs: Seq[Long])
  case class Pair(dst_id: Long, org_id: Long, common_cnt: Int,
      dtoks: Seq[String], dkinds: Seq[String], dvalues: Seq[String], ddfs: Seq[Long],
      otoks: Seq[String], okinds: Seq[String], ovalues: Seq[String], odfs: Seq[Long])

  /** Per-mention element-key/df array (all levels for all its tokens). */
  private def mentionElemDfs(tokens: DataFrame): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val h = Hierarchy.default
    val mentionToks = tokens.groupBy($"mention_id")
      .agg(sort_array(collect_list(struct($"pos", $"token"))).as("pt"))
      .select($"mention_id", expr("transform(pt, x -> x.token)").as("toks"))
    val keys = mentionToks.as[(Long, Seq[String])].flatMap { case (id, toks) =>
      val all = toks.flatMap { t =>
        val tk = h.tokenKey(t)
        val l2 = h.lift(tk)
        val l3 = l2.flatMap(h.lift)
        (tk +: (l2 ++ l3))
      }.distinct
      all.map(k => (id, k.kind.toString, k.value))
    }.toDF("mention_id", "kind", "value")
    keys.join(elementStats(tokens).select($"kind", $"value", $"df"), Seq("kind", "value"))
      .groupBy($"mention_id")
      .agg(collect_list($"kind").as("kinds"), collect_list($"value").as("values"),
        collect_list($"df").as("dfs"))
      .join(mentionToks, "mention_id")
  }

  /** Candidate pairs re-scored with the bi-directional hierarchical
    * similarity: (dst_id, org_id, common_cnt, bi_sim). */
  def rescoredPairs(tokens: DataFrame, candidates: DataFrame): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val me = mentionElemDfs(tokens)
    val d = me.select($"mention_id".as("dst_id"), $"toks".as("dtoks"),
      $"kinds".as("dkinds"), $"values".as("dvalues"), $"dfs".as("ddfs"))
    val o = me.select($"mention_id".as("org_id"), $"toks".as("otoks"),
      $"kinds".as("okinds"), $"values".as("ovalues"), $"dfs".as("odfs"))
    candidates.select($"dst_id", $"org_id", $"common_cnt")
      .join(d, "dst_id").join(o, "org_id")
      .as[Pair]
      .mapPartitions { it =>
        // hoisted per-partition: the hierarchy (JVM-wide lazy val) and one
        // scratch df map reused across rows — the per-row allocations here
        // were the slowest headline stage in round 1
        val h = Hierarchy.default
        val df = collection.mutable.HashMap.empty[ElementKey, Long]
        def add(ks: Seq[String], vs: Seq[String], ds: Seq[Long]): Unit = {
          var i = 0
          while (i < ks.length) {
            val lvl = ks(i) match { case "T" => 1; case "A" => 3; case _ => 2 }
            df(ElementKey(lvl, ks(i).charAt(0), vs(i))) = ds(i)
            i += 1
          }
        }
        it.map { p =>
          df.clear()
          add(p.dkinds, p.dvalues, p.ddfs); add(p.okinds, p.ovalues, p.odfs)
          val s = BiDirectional.sim(h, p.otoks, p.dtoks, df)
          (p.dst_id, p.org_id, p.common_cnt, s)
        }
      }
      .toDF("dst_id", "org_id", "common_cnt", "bi_sim")
  }

  /** The S-3 edges sink: one row per unordered surviving pair,
    * (source, target, weight, common_token_cnt) — IO.java:48-56. */
  def simGraphEdges(tokens: DataFrame, candidates: DataFrame): DataFrame =
    rescoredPairs(tokens, candidates)
      .select(least(col("dst_id"), col("org_id")).as("source"),
        greatest(col("dst_id"), col("org_id")).as("target"),
        round(col("bi_sim"), 6).as("weight"),
        col("common_cnt").as("common_token_cnt"))
      .dropDuplicates("source", "target")

  /** The S-3 vertices sink: (id, label, weight, res_id) — IO.java:40-47;
    * res_id = first gold id of the name (min for determinism). */
  def simGraphVertices(mentions: DataFrame, gold: DataFrame): DataFrame =
    mentions.join(gold, "name")
      .groupBy(col("mention_id").as("id"), col("name").as("label"),
        col("weight"))
      .agg(min(col("entity_id")).as("res_id"))

  // ---------------------------------------------------------------- oracle

  /** DuckDB CTEs mirroring [[elementStats]], including American Soundex as
    * a pure-SQL `list_reduce` fold (acc = 'digits~prevCode'; h/w carry the
    * previous code, vowels/y reset it, consecutive equal codes collapse)
    * and the nickname map inlined as VALUES. Append after Blocking.ctes. */
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
}
