package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary columns + typed
  * metadata, with batch decode / feature extraction via `mapPartitions`.
  *
  * The container has no image/audio codecs, so `fakeDecode` below is a
  * clearly-marked DETERMINISTIC STAND-IN for a real decoder (it derives
  * "dimensions" and a "channel mean" from the raw bytes). Everything
  * around it — the binary schema, the typed Dataset boundary, per-partition
  * batching, and the feature-table shape — is the real production
  * plumbing: swap `fakeDecode` for a JNI/javacpp decoder and nothing else
  * changes. */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, blob: Array[Byte],
      n_bytes: Long, source: String)
  final case class MediaFeatures(doc_id: Long, media_type: String, width: Int,
      height: Int, sum_bytes: Long, n_bytes: Long)

  /** Media table derived from documents: text bytes standing in for an
    * encoded image payload. */
  def mediaTable(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(
      col("doc_id"),
      lit("image").as("media_type"),
      col("text").cast("binary").as("blob"),
      length(col("text")).cast("long").as("n_bytes"),
      col("source")).as[MediaRow]
  }

  /** STUB DECODER — deterministic fake in place of a real image decode
    * (no codec libs in this environment). Real byte math, fake semantics. */
  private def fakeDecode(blob: Array[Byte]): (Int, Int, Long) = {
    val n = blob.length
    val width = 64 + n % 576
    val height = 64 + (n * 31) % 416
    val take = math.min(n, 256)
    var s = 0L
    var i = 0
    while (i < take) { s += blob(i) & 0xff; i += 1 }
    (width, height, s)
  }

  /** Batch feature extraction: one decoder instance per partition (the
    * production shape for codec contexts), rows streamed through it. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec context reuse)
      rows.map { r =>
        val (w, h, s) = fakeDecode(r.blob)
        MediaFeatures(r.doc_id, r.media_type, w, h, s, r.n_bytes)
      }
    }
  }

  final case class ResizedRow(doc_id: Long, media_type: String, width: Int,
      height: Int, resized_bytes: Long, checksum: Long)
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_bytes: Long,
      checksum: Long)

  /** STUB RESIZE — a real resize would decode, scale, re-encode inside the
    * same per-partition codec context; the stand-in truncates the payload
    * to the target raster budget and checksums it. The plumbing (typed
    * rows, per-partition batching, fixed output dims) is production. */
  def resize(media: Dataset[MediaRow], targetW: Int = 224, targetH: Int = 224): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    val budget = targetW.toLong * targetH / 8
    media.mapPartitions { rows =>
      rows.map { r =>
        val take = math.min(r.blob.length.toLong, budget).toInt
        var s = 0L
        var i = 0
        while (i < take) { s += r.blob(i) & 0xff; i += 1 }
        ResizedRow(r.doc_id, r.media_type, targetW, targetH, take.toLong, s)
      }
    }
  }

  /** STUB FRAME SAMPLER — treats the payload as fixed-size "frames"
    * (`frameBytes` each) and emits every `everyN`-th one with a checksum:
    * the one-to-many explode shape of real video frame sampling (a decoder
    * would seek + decode keyframes in the same per-partition loop). */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 256,
      everyN: Int = 2): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = (r.blob.length + frameBytes - 1) / frameBytes
      (0 until nFrames by everyN).iterator.map { f =>
        val start = f * frameBytes
        val end = math.min(start + frameBytes, r.blob.length)
        var s = 0L
        var i = start
        while (i < end) { s += r.blob(i) & 0xff; i += 1 }
        FrameRow(r.doc_id, f, (end - start).toLong, s)
      }
    }
  }

  // ---------------------------------------------------------------- oracle

  /** The fake decode/resize/sample are byte-arithmetic over ascii text, so
    * the oracle reproduces them from the text column. */
  val ctes: String =
    """media_features AS (
      |  SELECT doc_id, 'image' AS media_type,
      |         (64 + length(text) % 576)::INT AS width,
      |         (64 + (length(text) * 31) % 416)::INT AS height,
      |         list_sum([ord(x) FOR x IN split(substr(text, 1, 256), '')])::BIGINT
      |           AS sum_bytes,
      |         length(text)::BIGINT AS n_bytes
      |  FROM documents
      |),
      |media_resized AS (
      |  SELECT doc_id, 'image' AS media_type, 224 AS width, 224 AS height,
      |         least(length(text)::BIGINT, 224 * 224 // 8) AS resized_bytes,
      |         coalesce(list_sum([ord(x) FOR x IN
      |           split(substr(text, 1, (224 * 224 // 8)::INT), '')]), 0)::BIGINT
      |           AS checksum
      |  FROM documents
      |),
      |media_frames AS (
      |  SELECT d.doc_id, f.f::INT AS frame_idx,
      |         length(substr(d.text, f.f * 256 + 1, 256))::BIGINT AS frame_bytes,
      |         list_sum([ord(x) FOR x IN
      |           split(substr(d.text, f.f * 256 + 1, 256), '')])::BIGINT AS checksum
      |  FROM documents d,
      |       LATERAL (SELECT unnest(generate_series(0,
      |                  ((length(d.text) + 255) // 256) - 1, 2)) AS f) f
      |)""".stripMargin
}
