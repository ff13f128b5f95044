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
    * Totality BY CONSTRUCTION: signals are LEFT-joined from `documents`
    * with explicit defaults, so a signal op that drops a doc (e.g. a
    * future empty-text guard) yields a verdict row rather than silently
    * removing the doc from the output. Missing-signal defaults: dup and
    * contamination flags default to false (absence of evidence), while
    * lang/quality/repetition default to FAILING values ('und', 0.0, 1.0)
    * — a doc the analyzers could not score is dropped with a named
    * reason, never kept unexamined.
    *
    * `pairsDf`/`shinglesDf`/`clustersDf` inject checkpointed upstream
    * stages (see the Queries memoizer) so the LSH chain is not recomputed
    * per signal; `clustersDf` additionally lets a pipeline that needs the
    * near-dup clusters ELSEWHERE (e.g. the leakage-safe split in
    * [[graft.Presets.assembleDataset]]) run the iterative
    * connected-components stage exactly once. */
  def keepSet(documents: DataFrame, benchmark: DataFrame,
      minQuality: Double = 0.5,
      maxTopWordRatio: Double = 0.2,
      maxDup3GramRatio: Double = 0.2,
      keepLang: String = "en",
      pairsDf: Option[DataFrame] = None,
      shinglesDf: Option[DataFrame] = None,
      clustersDf: Option[DataFrame] = None): DataFrame = {
    val e = TextDedup.exactDups(documents)
      .select(col("doc_id"), col("is_dup").as("exact_dup"))
    val n = clustersDf.getOrElse(TextDedup.nearDupClusters(documents, pairsDf))
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
      .join(e, Seq("doc_id"), "left").join(n, Seq("doc_id"), "left")
      .join(l, Seq("doc_id"), "left").join(q, Seq("doc_id"), "left")
      .join(r, Seq("doc_id"), "left").join(c, Seq("doc_id"), "left")
      .withColumn("reason",
        when(coalesce(col("exact_dup"), lit(false)), "exact_dup")
          .when(coalesce(col("near_dup"), lit(false)), "near_dup")
          .when(coalesce(col("lang_pred"), lit("und")) =!= keepLang, "lang")
          .when(coalesce(col("quality"), lit(0.0)) < minQuality, "quality")
          .when(coalesce(col("top_word_ratio"), lit(1.0)) > maxTopWordRatio ||
            coalesce(col("dup_3gram_ratio"), lit(1.0)) > maxDup3GramRatio,
            "repetition")
          .when(coalesce(col("is_contaminated"), lit(false)), "contaminated")
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
      |         CASE WHEN coalesce(e.is_dup, false) THEN 'exact_dup'
      |              WHEN coalesce(n.is_dup, false) THEN 'near_dup'
      |              WHEN coalesce(l.lang_pred, 'und') <> 'en' THEN 'lang'
      |              WHEN coalesce(q.quality, 0.0) < 0.5 THEN 'quality'
      |              WHEN coalesce(r.top_word_ratio, 1.0) > 0.2
      |                   OR coalesce(r.dup_3gram_ratio, 1.0) > 0.2
      |                   THEN 'repetition'
      |              WHEN coalesce(c.is_contaminated, false) THEN 'contaminated'
      |              ELSE 'kept' END AS reason
      |  FROM documents d
      |  LEFT JOIN exact_dups e USING (doc_id)
      |  LEFT JOIN neardup_clusters n USING (doc_id)
      |  LEFT JOIN lang_id l USING (doc_id)
      |  LEFT JOIN quality q USING (doc_id)
      |  LEFT JOIN repetition r USING (doc_id)
      |  LEFT JOIN decontam c USING (doc_id)
      |)""".stripMargin

  /** DuckDB CTEs for the ARRIVAL-ORDER founder verdict — the batch twin of
    * the streaming curation keepSet
    * ([[graft.streaming.StreamingCuration.keepSetBatch]] with
    * ts = timestamp_seconds(doc_id), so (ts, doc_id) arrival order is
    * doc_id order and the per-bucket founder is plain min(doc_id)).
    * Unlike [[ctes]]' keep_set (near_dup = CC-cluster min-representative),
    * near_dup here flags every NON-FOUNDER bucket-mate — the streaming
    * founder semantics. Append after TextDedup.ctes AND TextAnalysis.ctes
    * (uses exact_dups, lsh_buckets, lang_id, quality, repetition,
    * decontam). */
  val founderCtes: String =
    """founder_near AS (
      |  SELECT DISTINCT x.doc_id, true AS is_dup
      |  FROM lsh_buckets x JOIN lsh_buckets y USING (band, bucket_key)
      |  WHERE y.doc_id < x.doc_id
      |),
      |stream_keepset AS (
      |  SELECT d.doc_id,
      |         CASE WHEN coalesce(e.is_dup, false) THEN 'exact_dup'
      |              WHEN coalesce(nf.is_dup, false) THEN 'near_dup'
      |              WHEN coalesce(l.lang_pred, 'und') <> 'en' THEN 'lang'
      |              WHEN coalesce(q.quality, 0.0) < 0.5 THEN 'quality'
      |              WHEN coalesce(r.top_word_ratio, 1.0) > 0.2
      |                   OR coalesce(r.dup_3gram_ratio, 1.0) > 0.2
      |                   THEN 'repetition'
      |              WHEN coalesce(c.is_contaminated, false) THEN 'contaminated'
      |              ELSE 'kept' END AS reason
      |  FROM documents d
      |  LEFT JOIN exact_dups e USING (doc_id)
      |  LEFT JOIN founder_near nf USING (doc_id)
      |  LEFT JOIN lang_id l USING (doc_id)
      |  LEFT JOIN quality q USING (doc_id)
      |  LEFT JOIN repetition r USING (doc_id)
      |  LEFT JOIN decontam c USING (doc_id)
      |)""".stripMargin
}
