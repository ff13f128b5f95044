package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: candidate edges whose two names have different last tokens
  * (the cross-block bridges that glue the giant component). */
object DebugBridges {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val m = pipeline.Canonicalize.mentions(synth.Synth.transcripts(spark, dir)).cache()
    val t = pipeline.Tokenize.tokens(m)
    val c = pipeline.Blocking.candidates(t)
    val withNames = c
      .join(m.select($"mention_id".as("dst_id"), $"name".as("dst_name")), "dst_id")
      .join(m.select($"mention_id".as("org_id"), $"name".as("org_name")), "org_id")
      .withColumn("dl", element_at(split($"dst_name", " "), -1))
      .withColumn("ol", element_at(split($"org_name", " "), -1))
    val lastUniverse = (for {
      (b, i) <- (synth.NamePools.last ++ synth.NamePools.misspellOfLast).zipWithIndex
      s <- synth.NamePools.lastSuffix
    } yield b + s).distinct
    val lu = typedLit(lastUniverse)
    val cross = withNames
      .withColumn("shared", array_intersect(
        split(regexp_replace($"dst_name", "\\.", ""), " "),
        split(regexp_replace($"org_name", "\\.", ""), " ")))
      .filter(size(array_intersect($"shared", lu)) === 0)
      .cache()
    println(s"cross-last edges: ${cross.count()} of total")
    cross.select($"dst_name", $"org_name", $"common_cnt", round($"sum_sim", 4).as("ss"),
      round($"self_sim", 4).as("sf")).show(15, false)
    spark.stop()
  }
}
