package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: component size + edge density at a scale factor. */
object DebugComponents {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val m = pipeline.Canonicalize.mentions(synth.Synth.transcripts(spark, dir))
    val t = pipeline.Tokenize.tokens(m)
    val c = pipeline.Blocking.candidates(t).cache()
    println(s"candidates(directed)=${c.count()}")
    val cc = pipeline.ConnectedComponents.assignments(m, c).cache()
    println("component size histogram:")
    val sizes = cc.groupBy($"component_id").count()
    sizes.groupBy(
      when($"count" === 1, "1").when($"count" <= 10, "2-10")
        .when($"count" <= 100, "11-100").when($"count" <= 1000, "101-1000")
        .when($"count" <= 5000, "1001-5000").otherwise(">5000").as("bucket"))
      .agg(count(lit(1)).as("components"), sum($"count").as("refs"))
      .orderBy($"bucket").show()
    println("top components by size:")
    sizes.orderBy($"count".desc).show(5)
    // edges per large component
    val edges = c.select(least($"dst_id", $"org_id").as("src"),
      greatest($"dst_id", $"org_id").as("dst")).distinct()
      .join(cc.select($"mention_id".as("src"), $"component_id"), "src")
    edges.groupBy($"component_id").count().orderBy($"count".desc).show(5)
    spark.stop()
  }
}
