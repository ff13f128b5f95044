package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: time the clustering job at a given parallelism over
  * K-replicated tables. usage: runMain graft.DebugScale <sfDir> <K> <cpus>
  * [parts] */
object DebugScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val k = args(1).toInt; val cpus = args(2).toInt
    val parts = if (args.length > 3) args(3).toInt else 128
    val base = s"/tmp/graft_scale_$k"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$base/tokens").exists()) {
      val t0 = pipeline.Tokenize.tokens(
        pipeline.Canonicalize.mentions(synth.Synth.transcripts(spark, dir)))
      val r = spark.range(k).toDF("r")
      t0.crossJoin(r)
        .withColumn("mention_id", col("mention_id") + col("r") * lit(1000000000L))
        .withColumn("token", concat(col("token"), lit("~"), col("r")))
        .withColumn("name", concat(col("name"), lit("~"), col("r")))
        .drop("r").write.mode("overwrite").parquet(s"$base/tokens")
      spark.read.parquet(s"$base/tokens")
        .select(col("mention_id"), col("name"), col("weight")).distinct()
        .write.mode("overwrite").parquet(s"$base/mentions")
    }
    val m = spark.read.parquet(s"$base/mentions")
    val t = spark.read.parquet(s"$base/tokens")

    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $label median ${ts.sorted.apply(reps / 2)}%.1f s " +
        s"(all: ${ts.map(x => f"$x%.1f").mkString(", ")})")
    }
    val cand = pipeline.Blocking.candidates(t)
    time("candidates")(cand.write.format("noop").mode("overwrite").save())
    val candCp = cand.localCheckpoint()
    time("cc")(pipeline.ConnectedComponents.assignments(m, candCp)
      .write.format("noop").mode("overwrite").save())
    time("greedy-full")(pipeline.GreedyClustering.assignments(m, t, candCp)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
