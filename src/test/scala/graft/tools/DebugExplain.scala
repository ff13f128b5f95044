package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: formatted physical plan of the raw (un-memoized) blocking
  * stage, for shuffle/exchange review. */
object DebugExplain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false") // show static plan
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = pipeline.Tokenize.tokens(
      pipeline.Canonicalize.mentions(synth.Synth.transcripts(spark, dir)))
    pipeline.Blocking.candidates(t).explain("formatted")
    spark.stop()
  }
}
