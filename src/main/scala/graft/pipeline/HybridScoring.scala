package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Stage 4b — hybrid pairwise scorers inside blocks (north-rule addition;
  * the reference declares but never uses edit-distance scorers, SURVEY.md
  * §2.9). Evaluated ONLY on surviving candidate pairs, so the expensive
  * string kernels run on the post-blocking set (0.04%-scale of the cross
  * product per the reference's published pruning counts), inside
  * whole-stage codegen via custom Catalyst expressions. */
object HybridScoring {

  /** candidates + (dst_name, org_name, jw, lev, monge_elkan). */
  def hybridCandidates(mentions: DataFrame, candidates: DataFrame): DataFrame = {
    GraftFunctions.register(mentions.sparkSession)
    candidates
      .join(mentions.select(col("mention_id").as("dst_id"), col("name").as("dst_name")), "dst_id")
      .join(mentions.select(col("mention_id").as("org_id"), col("name").as("org_name")), "org_id")
      .withColumn("jw", expr("graft_jaro_winkler(dst_name, org_name)"))
      .withColumn("lev", levenshtein(col("dst_name"), col("org_name")))
      .withColumn("monge_elkan", expr("graft_monge_elkan(dst_name, org_name)"))
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB CTE `hybrid_candidates`; append after Blocking.ctes. Monge-Elkan
    * is expressed with list comprehensions over whitespace tokens. */
  val ctes: String =
    """hybrid_candidates AS (
      |  SELECT c.dst_id, c.org_id, c.common_cnt, c.sum_sim, c.self_sim,
      |         md.name AS dst_name, mo.name AS org_name,
      |         jaro_winkler_similarity(md.name, mo.name) AS jw,
      |         levenshtein(md.name, mo.name) AS lev,
      |         list_avg([list_max([jaro_winkler_similarity(x, y)
      |                             FOR y IN string_split(mo.name, ' ')])
      |                   FOR x IN string_split(md.name, ' ')]) AS monge_elkan
      |  FROM candidates c
      |  JOIN mentions md ON c.dst_id = md.mention_id
      |  JOIN mentions mo ON c.org_id = mo.mention_id
      |)""".stripMargin
}
