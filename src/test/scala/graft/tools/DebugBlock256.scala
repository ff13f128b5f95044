package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off evidence run for the blocking-stage scaling contract: the SAME
  * methodology as Bench's 64x point (fresh local-cluster[N,1,3072] per
  * measurement group, warm page cache, 3 samples per level, min estimator,
  * all samples published) at 256x-replicated input — the work volume where
  * the 4-point Amdahl fit predicts efficiency ~0.92, i.e. far enough from
  * the per-run fixed cost that run-to-run host noise cannot straddle the
  * 0.8 contract line the way the 64x point does.
  *
  * usage: Test/runMain graft.DebugBlock256 <sfDir> [K] [levels-csv] [parts]
  * e.g. `... sf0.1 256 2,4,8` measures all three executor counts (the
  * 3-point curve separates job scaling from the shared-host I/O ceiling).
  */
object DebugBlock256 {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 256
    val levels = (if (args.length > 2) args(2) else "2,8")
      .split(",").map(_.trim.toInt).toSeq
    val parts = if (args.length > 3) args(3).toInt else 256
    val tokensK = s"/tmp/graft_block_x$k/tokens"

    // build the replicated tokens once (any local session)
    if (!new java.io.File(tokensK).exists()) {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val t0 = pipeline.Tokenize.tokens(
        pipeline.Canonicalize.mentions(synth.Synth.transcripts(s, sfDir)))
      s.range(k).toDF("r").crossJoin(t0)
        .withColumn("mention_id", col("mention_id") + col("r") * lit(1000000000L))
        .withColumn("token", concat(col("token"), lit("~"), col("r")))
        .withColumn("name", concat(col("name"), lit("~"), col("r")))
        .drop("r")
        .repartition(128)
        .write.mode("overwrite").parquet(tokensK)
      s.stop()
    }

    def clusterSession(execs: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local-cluster[$execs,1,3072]")
        .appName(s"graft-block$k-$execs")
        .config("spark.executor.extraClassPath",
          s"${sys.props("user.dir")}/target/scala-2.13/classes" +
            s":${sys.props("user.dir")}/target/scala-2.13/test-classes")
        .config("spark.sql.shuffle.partitions", parts.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def measure(execs: Int): Seq[Double] = {
      val s = clusterSession(execs)
      try {
        force(s.read.parquet(tokensK)) // warm page cache, untimed
        Seq.fill(3)(time(force(
          pipeline.Blocking.candidates(s.read.parquet(tokensK)))))
      } finally s.stop()
    }

    // high levels first (shortest), so an interrupted run still yields data
    val results = levels.sorted(Ordering[Int].reverse).map { e =>
      val samples = measure(e)
      println(f"BLOCK$k ${e}x1: ${samples.map(x => f"$x%.1f").mkString(", ")} min=${samples.min}%.1f")
      e -> samples.min
    }.sortBy(_._1)
    results.sliding(2).foreach {
      case Seq((eLo, tLo), (eHi, tHi)) =>
        val eff = (tLo / tHi) / (eHi.toDouble / eLo)
        println(f"BLOCK$k efficiency $eLo -> $eHi execs (min-based): $eff%.3f")
      case _ => ()
    }
  }
}
