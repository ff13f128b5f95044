package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev runner: `runMain graft.DevRun <query> <sfDir> [n] [explain]`. */
object DevRun {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val n = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(q)(spark, dir)
    if (args.contains("explain")) df.explain("formatted")
    df.show(n, false)
    spark.stop()
  }
}
