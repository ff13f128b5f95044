package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming front end for the canonicalization stage: the same
  * transcript rows (conv_id, turn_idx, role, text, tool, ts) arriving as a
  * stream instead of a table. Three operators:
  *
  *  - [[mentionEvents]]: stateless per-turn mention extraction (append);
  *  - [[mentionWeights]]: watermarked sliding aggregation of mention
  *    occurrence counts — the streaming analogue of the batch `weight`
  *    column (update mode; late turns beyond the watermark are dropped);
  *  - [[assembleDocs]]: per-conversation incremental document assembly via
  *    flatMapGroupsWithState — state accumulates turns, emits the mention
  *    document when the closing turn arrives (event-time timeout flushes
  *    conversations whose tail never arrives).
  *
  * The batch pipeline stays the system of record; this is the ingest path
  * that lands the same rows continuously (per-turn text equality and
  * stable turn ordering preserved — the graft's per-row invariant).
  */
object StreamingMentions {

  final case class Turn(conv_id: String, turn_idx: Int, role: String,
      text: String, tool: String, ts: Timestamp)
  final case class ConvState(turns: Seq[(Int, String)], maxTs: Long)
  final case class DocOut(conv_id: String, window_start_turn: Int, doc: String,
      n_turns: Int)

  /** Regex shared with the batch path (Canonicalize.mentionRegex). */
  private val rx = graft.pipeline.Canonicalize.mentionRegex

  /** Stateless: one row per planted mention occurrence. Append-safe. */
  def mentionEvents(turns: DataFrame): DataFrame =
    turns.select(col("conv_id"), col("turn_idx"), col("ts"),
      explode(expr(s"regexp_extract_all(text, '${rx.replace("\\", "\\\\")}', 1)")).as("name"))

  /** Watermarked mention-occurrence counts per event-time window: the
    * streaming `weight`. 10-minute windows, 5-minute lateness bound —
    * state is bounded by (names x open windows), shuffled by (name,
    * window): partial aggregation + state-store lookups only, no global
    * structures, so it holds at any executor count. */
  def mentionWeights(turns: DataFrame,
      windowLen: String = "10 minutes", lateness: String = "5 minutes"): DataFrame =
    mentionEvents(turns)
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("name"))
      .agg(count(lit(1)).as("weight"))

  /** Per-conversation document assembly. `closingTurn` marks the last turn
    * of a conversation (4-turn conversations in this corpus); stragglers
    * are flushed by event-time timeout once the watermark passes their
    * last activity + `timeoutMs`. */
  def assembleDocs(turns: Dataset[Turn], closingTurn: Int = 3,
      timeoutMs: Long = 10 * 60 * 1000L): Dataset[DocOut] = {
    import turns.sparkSession.implicits._
    def emit(convId: String, st: ConvState): DocOut = {
      val ordered = st.turns.sortBy(_._1)
      // window_start_turn = smallest turn actually buffered — a timeout
      // flush with a missing head must not claim it started at turn 0
      DocOut(convId, ordered.head._1, ordered.map(_._2).mkString("\n"), ordered.size)
    }
    turns
      .withWatermark("ts", "5 minutes")
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, DocOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (convId, rows, state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit(convId, _)).iterator
            state.remove()
            out
          } else {
            val prev = state.getOption.getOrElse(ConvState(Seq.empty, 0L))
            var maxTs = prev.maxTs
            val all = prev.turns ++ rows.map { t =>
              maxTs = math.max(maxTs, t.ts.getTime)
              (t.turn_idx, t.text)
            }
            if (all.exists(_._1 == closingTurn)) {
              state.remove()
              Iterator.single(emit(convId, ConvState(all, maxTs)))
            } else {
              state.update(ConvState(all, maxTs))
              state.setTimeoutTimestamp(maxTs + timeoutMs)
              Iterator.empty
            }
          }
      }
  }

  /** Streaming exact dedup over a document stream: first writer wins per
    * md5(text) inside the watermark horizon. Uses
    * dropDuplicatesWithinWatermark so the per-hash state entries ARE
    * evicted once the watermark passes them — plain dropDuplicates on a
    * non-event-time key would grow state forever on a continuous feed. */
  def dedupedDocs(docs: DataFrame, lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("text_hash")
}
