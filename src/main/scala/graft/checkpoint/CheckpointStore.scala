package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import java.nio.charset.StandardCharsets

/** Per-stage checkpointing with lineage + counters (north rule: every
  * stage checkpointed with per-partition lineage and counters for full
  * resumability).
  *
  * Layout per stage under `root`:
  *   <root>/<stage>/data/          partitioned parquet
  *   <root>/<stage>/_manifest.json stage, input fingerprint, snapshot id,
  *                                 row count, per-partition row counters,
  *                                 wall time
  *
  * This emulates an Iceberg-style snapshot manifest: no Iceberg runtime
  * jar exists in this offline environment (SURVEY.md §7.4), so the layout
  * is Hive-partitioned parquet + a JSON manifest behind this trait-shaped
  * API; a real Iceberg catalog can be dropped in by reimplementing
  * write/read against `spark.table` + `snapshot_id`.
  *
  * Resumability contract: a stage is skipped iff its manifest exists AND
  * its recorded input fingerprint equals the current chained fingerprint
  * (config + upstream fingerprints hashed in), making restarts idempotent
  * and stale checkpoints self-invalidating.
  */
final class CheckpointStore(root: String, spark: SparkSession) {

  private def dir(stage: String): Path = Paths.get(root, stage)
  private def manifestPath(stage: String): Path = dir(stage).resolve("_manifest.json")
  private def dataPath(stage: String): String = dir(stage).resolve("data").toString

  def isComplete(stage: String, fingerprint: String): Boolean = {
    val p = manifestPath(stage)
    Files.exists(p) && {
      val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      txt.contains(s""""input_fingerprint": "$fingerprint"""")
    }
  }

  def read(stage: String): DataFrame = spark.read.parquet(dataPath(stage))

  /** Write the stage table + manifest; returns the re-read DataFrame so
    * downstream stages consume the materialized checkpoint (truncated
    * lineage), not the logical plan. */
  def write(stage: String, df: DataFrame, fingerprint: String): DataFrame = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").parquet(dataPath(stage))
    val back = read(stage)
    val partCounts = back.groupBy(spark_partition_id().as("p"))
      .count().orderBy(col("p"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val rows = partCounts.map(_._2).sum
    val wallMs = (System.nanoTime() - t0) / 1000000
    val counters = partCounts.map { case (p, c) => s"""{"partition": $p, "rows": $c}""" }
      .mkString("[", ", ", "]")
    val manifest =
      s"""{
         |  "stage": "$stage",
         |  "input_fingerprint": "$fingerprint",
         |  "snapshot_id": "${stage}_${fingerprint}",
         |  "rows": $rows,
         |  "partitions": ${partCounts.length},
         |  "partition_counters": $counters,
         |  "write_wall_ms": $wallMs
         |}""".stripMargin
    Files.createDirectories(dir(stage))
    Files.write(manifestPath(stage), manifest.getBytes(StandardCharsets.UTF_8))
    back
  }

  /** Run-or-resume: skip when the checkpoint is current, else compute. */
  def stage(name: String, fingerprint: String)(compute: => DataFrame): DataFrame =
    if (isComplete(name, fingerprint)) read(name)
    else write(name, compute, fingerprint)
}

object CheckpointStore {
  /** Deterministic chained fingerprint (hex of 64-bit FNV-1a). */
  def fingerprint(parts: String*): String = {
    var h = 0xcbf29ce484222325L
    parts.foreach { s =>
      s.foreach { c => h ^= c.toLong; h *= 0x100000001b3L }
      h ^= 0x1fL; h *= 0x100000001b3L
    }
    java.lang.Long.toHexString(h)
  }
}
