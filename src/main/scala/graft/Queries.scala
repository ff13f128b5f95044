package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.Synth

/** Registry backing SparkEntry: name -> (query fn, optional DuckDB oracle).
  *
  * Convention: every float column is rounded to 6 dp on BOTH sides so the
  * driver's value-hash compare is insensitive to summation order;
  * timestamps are surfaced as epoch seconds.
  */
object Queries {

  type QueryFn = (SparkSession, String) => DataFrame

  /** Prefix a DuckDB query with the shared corpus CTEs. */
  private def withCorpus(body: String, extraCtes: Seq[String] = Nil): String = {
    val ctes = (Synth.transcriptsCte +: extraCtes).mkString(",\n")
    s"WITH $ctes\n$body"
  }

  val registry: Map[String, (QueryFn, Option[String])] = Map(

    // S-1/input (SURVEY.md §2.1): the synthesized transcripts corpus itself.
    "q_transcripts" -> (
      ((spark: SparkSession, sfDir: String) =>
        Synth.transcripts(spark, sfDir)
          .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
            col("tool"), unix_timestamp(col("ts")).as("ts_epoch"))),
      Some(withCorpus(
        """SELECT conv_id, turn_idx, role, text, tool,
          |       epoch(ts)::BIGINT AS ts_epoch
          |FROM transcripts""".stripMargin))
    ),

    // Gold labels (RID_REF analogue) — evaluation input.
    "q_gold_mentions" -> (
      ((spark: SparkSession, sfDir: String) => Synth.goldMentions(spark, sfDir)),
      Some(withCorpus(
        "SELECT name, entity_id, cnt FROM gold_mentions",
        Seq(Synth.goldMentionsCte)))
    )
  )
}
