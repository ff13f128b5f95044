package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: scoring-kernel scaling in isolation.
  * usage: runMain graft.DebugKernel <cpus> [parts] — expects the scaled
  * tables at /tmp/graft_scale_16. */
object DebugKernel {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val parts = if (args.length > 1) args(1).toInt else 128
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val base = "/tmp/graft_scale_16"
    // materialize pairs once (reused across invocations)
    val pairsPath = s"$base/pairs"
    if (!new java.io.File(pairsPath).exists())
      pipeline.Blocking.scoredPairs(spark.read.parquet(s"$base/tokens"))
        .write.mode("overwrite").parquet(pairsPath)
    val names = spark.read.parquet(s"$base/mentions")
    def kernel() = spark.read.parquet(pairsPath)
      .join(names.select(col("mention_id").as("dst_id"), col("name").as("dst_name"))
        .hint("SHUFFLE_HASH"), "dst_id")
      .join(names.select(col("mention_id").as("org_id"), col("name").as("org_name"))
        .hint("SHUFFLE_HASH"), "org_id")
      .select(expr("graft_jaro_winkler(dst_name, org_name)").as("jw"),
        levenshtein(col("dst_name"), col("org_name")).as("lev"),
        expr("graft_monge_elkan(dst_name, org_name)").as("me"))
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      kernel().write.format("noop").mode("overwrite").save()
      println(f"KERNEL cpus=$cpus rep=$i ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
