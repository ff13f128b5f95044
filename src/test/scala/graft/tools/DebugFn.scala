package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: break down the greedy clusterer's false-negative pairs by
  * name-pair shape. `runMain graft.DebugFn <sfDir>`. */
object DebugFn {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val a = SparkEntry.queries("q_greedy_assignments")(spark, dir)
    val g = graft.synth.Synth.goldMentions(spark, dir)
    val ga = a.join(g, "name").localCheckpoint()
    val fn = ga.as("x").join(ga.as("y"),
        $"x.entity_id" === $"y.entity_id" && $"x.name" < $"y.name")
      .filter($"x.cluster_id" =!= $"y.cluster_id")
      .select($"x.name".as("n1"), $"y.name".as("n2"),
        ($"x.cnt" * $"y.cnt").as("w"),
        ($"x.component_id" === $"y.component_id").as("same_comp"))
      .withColumn("lw1", element_at(split($"n1", " "), -1))
      .withColumn("lw2", element_at(split($"n2", " "), -1))
      .withColumn("f1", element_at(split($"n1", " "), 1))
      .withColumn("f2", element_at(split($"n2", " "), 1))
      .withColumn("shape",
        when($"lw1" =!= $"lw2", "last-differs(misspell/reorder)")
          .when(length($"f1") <= 2 || length($"f2") <= 2, "initial-form")
          .when($"f1" =!= $"f2", "first-differs(nickname)")
          .otherwise("other"))
      .localCheckpoint()
    println("== weighted FN by shape / same-component:")
    fn.groupBy($"shape", $"same_comp")
      .agg(sum($"w").as("weighted_fn"), count(lit(1)).as("pairs"))
      .orderBy(desc("weighted_fn")).show(20, false)
    println("== top FN pairs:")
    fn.orderBy(desc("w")).show(50, false)
    spark.stop()
  }
}
