package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 1 — canonicalization: windowed turn aggregation of transcripts into
  * entity-mention documents, then the mention (REFERENCE-vertex) table.
  *
  * Reference analogue: the externally-prepared vertices.tsv REF rows
  * (dao/G.java:129-156, dao/vertex/RefV.java:13); `weight` = corpus
  * occurrence count of the exact surface (dao/vertex/V.java:63).
  *
  * Scale notes: every transform groups by `conv_id` or `name` — a single
  * hash-partitioned shuffle each, no window over an unpartitioned frame:
  * the `mention_id` is a parallel hash of the surface, so no stage in this
  * file has a single-task bottleneck at any scale.
  */
object Canonicalize {

  /** Regex extracting planted entity surfaces between [[ ]] markers. */
  val mentionRegex = "\\[\\[([a-z. ]+)\\]\\]"

  /** Mention documents: one per conversation window (window = whole
    * conversation here; `windowTurns` caps turns per window when set).
    * Turn order is stable on turn_idx; per-turn text equality is preserved
    * verbatim inside the doc (the per-row invariant of the graft). */
  def mentionDocs(transcripts: DataFrame, windowTurns: Int = Int.MaxValue): DataFrame = {
    val winStart = (col("turn_idx") / windowTurns).cast("int") * windowTurns
    transcripts
      .withColumn("window_start_turn", winStart)
      .groupBy(col("conv_id"), col("window_start_turn"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("turn_idx"), col("text")))),
            t => t.getField("text")),
          "\n").as("doc"),
        count(lit(1)).cast("int").as("n_turns"))
  }

  /** One row per planted mention occurrence: (conv_id, turn_idx, name). */
  def mentionEvents(transcripts: DataFrame): DataFrame =
    transcripts
      .select(col("conv_id"), col("turn_idx"),
        explode(expr(s"regexp_extract_all(text, '${mentionRegex.replace("\\", "\\\\")}', 1)")).as("name"))

  /** The mention (reference) table: distinct surface + corpus weight + a
    * deterministic id.
    *
    * The id is the top 60 bits of md5(name) — embarrassingly parallel (no
    * global sort / single-task row_number stage, which was the
    * driver-adjacent bottleneck at billions of distinct surfaces) and
    * reproducible bit-for-bit in the DuckDB oracle. Collision odds at
    * n distinct names are ~n^2/2^61 (≈3e-5 at n=10^7); a production run
    * over billions of names must extend to the full 128-bit digest —
    * [[assertUniqueIds]] is the guard and is exercised by Pipeline and the
    * test suite. */
  def mentions(transcripts: DataFrame): DataFrame =
    mentionEvents(transcripts)
      .groupBy(col("name"))
      .agg(count(lit(1)).as("weight"))
      .withColumn("mention_id",
        conv(substring(md5(col("name")), 1, 15), 16, 10).cast("long"))

  /** Raises if the hash id collides (distinct names must map 1:1 to ids). */
  def assertUniqueIds(mentions: DataFrame): Unit = {
    val dupes = mentions.groupBy(col("mention_id"))
      .count().filter(col("count") > 1).count()
    if (dupes > 0)
      sys.error(s"mention_id hash collision on $dupes ids — widen the id digest")
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB CTEs: mention_docs, mention_events, mentions. Append after
    * Synth.transcriptsCte. */
  val ctes: String =
    """mention_docs AS (
      |  SELECT conv_id, 0 AS window_start_turn,
      |         string_agg(text, chr(10) ORDER BY turn_idx) AS doc,
      |         count(*)::INT AS n_turns
      |  FROM transcripts GROUP BY conv_id
      |),
      |mention_events AS (
      |  SELECT conv_id, turn_idx,
      |         unnest(regexp_extract_all(text, '\[\[([a-z. ]+)\]\]', 1)) AS name
      |  FROM transcripts
      |),
      |mentions AS (
      |  SELECT name, count(*) AS weight,
      |         ('0x' || substr(md5(name), 1, 15))::BIGINT AS mention_id
      |  FROM mention_events GROUP BY name
      |)""".stripMargin
}
