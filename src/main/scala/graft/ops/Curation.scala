package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the keep/drop decision a pretraining data
  * pipeline runs after all per-doc signals are computed — the composition
  * of this library's dedup, language, quality, repetition and
  * decontamination operators into one verdict per document (the C4 /
  * Gopher-style filter chain).
  *
  * Scale shape: every input is keyed by doc_id (each produced by a
  * single-scan projection or an already-bucketed dedup pass), so the
  * composition is a chain of co-partitioned hash joins on the same key —
  * one shuffle per side at worst, no row expansion anywhere; AQE collapses
  * the small sides to broadcasts at low sf.
  */
object Curation {

  /** One row per document: (doc_id, keep, reason) where reason is the
    * FIRST failing filter in the fixed priority order (exact_dup,
    * near_dup, lang, quality, repetition, contaminated) or 'kept'.
    *
    * `pairsDf`/`shinglesDf` inject checkpointed upstream stages (see the
    * Queries memoizer) so the LSH chain is not recomputed per signal. */
  def keepSet(documents: DataFrame, benchmark: DataFrame,
      minQuality: Double = 0.5,
      maxTopWordRatio: Double = 0.2,
      maxDup3GramRatio: Double = 0.2,
      keepLang: String = "en",
      pairsDf: Option[DataFrame] = None,
      shinglesDf: Option[DataFrame] = None): DataFrame = {
    val e = TextDedup.exactDups(documents)
      .select(col("doc_id"), col("is_dup").as("exact_dup"))
    val n = TextDedup.nearDupClusters(documents, pairsDf)
      .select(col("doc_id"), col("is_dup").as("near_dup"))
    val l = TextAnalysis.langId(documents)
      .select(col("doc_id"), col("lang_pred"))
    val q = TextAnalysis.qualityScore(documents)
      .select(col("doc_id"), col("quality"))
    val r = TextAnalysis.repetition(documents)
      .select(col("doc_id"), col("top_word_ratio"), col("dup_3gram_ratio"))
    val c = TextDedup.decontaminate(documents, benchmark, shinglesDf = shinglesDf)
      .select(col("doc_id"), col("is_contaminated"))
    documents.select(col("doc_id"))
      .join(e, "doc_id").join(n, "doc_id").join(l, "doc_id")
      .join(q, "doc_id").join(r, "doc_id").join(c, "doc_id")
      .withColumn("reason",
        when(col("exact_dup"), "exact_dup")
          .when(col("near_dup"), "near_dup")
          .when(col("lang_pred") =!= keepLang, "lang")
          .when(col("quality") < minQuality, "quality")
          .when(col("top_word_ratio") > maxTopWordRatio ||
            col("dup_3gram_ratio") > maxDup3GramRatio, "repetition")
          .when(col("is_contaminated"), "contaminated")
          .otherwise("kept"))
      .select(col("doc_id"), (col("reason") === "kept").as("keep"), col("reason"))
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB CTE mirroring [[keepSet]] with the default thresholds. Append
    * after TextDedup.ctes AND TextAnalysis.ctes (uses exact_dups,
    * neardup_clusters, decontam, lang_id, quality, repetition). */
  val ctes: String =
    """keep_set AS (
      |  SELECT d.doc_id,
      |         CASE WHEN e.is_dup THEN 'exact_dup'
      |              WHEN n.is_dup THEN 'near_dup'
      |              WHEN l.lang_pred <> 'en' THEN 'lang'
      |              WHEN q.quality < 0.5 THEN 'quality'
      |              WHEN r.top_word_ratio > 0.2 OR r.dup_3gram_ratio > 0.2
      |                   THEN 'repetition'
      |              WHEN c.is_contaminated THEN 'contaminated'
      |              ELSE 'kept' END AS reason
      |  FROM documents d
      |  JOIN exact_dups e USING (doc_id)
      |  JOIN neardup_clusters n USING (doc_id)
      |  JOIN lang_id l USING (doc_id)
      |  JOIN quality q USING (doc_id)
      |  JOIN repetition r USING (doc_id)
      |  JOIN decontam c USING (doc_id)
      |)""".stripMargin
}
