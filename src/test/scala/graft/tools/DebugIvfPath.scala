package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: inline (literal-folded HOF) vs broadcast (mapPartitions)
  * IVF probe path wall time at the same centroid set — the measurement
  * that made broadcast the only production path (round 5): 2-5x faster at
  * EVERY nlist because the inline form scores cells through an
  * interpreted higher-order transform island. Both paths stay
  * parity-pinned in OpsSpec (the inline form is the oracle-shaped
  * reference implementation). */
object DebugIvfPath {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (nlist <- Seq(16, 64, 200)) {
      val cents = emb.select(col("vec_id"), col("embedding"))
        .orderBy(col("vec_id")).limit(nlist).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        .toIndexedSeq
      // warm + 2 timed runs each, min
      def run(f: => Unit): Double = { f; math.min(time(f), time(f)) }
      val inl = run { Similarity.ivfProbesInline(emb, cents, 8).count() }
      val bc = run { Similarity.ivfProbesBroadcast(emb, cents, 8).count() }
      println(f"nlist=$nlist%4d inline=$inl%7.3fs broadcast=$bc%7.3fs")
    }
    spark.stop()
  }
}
