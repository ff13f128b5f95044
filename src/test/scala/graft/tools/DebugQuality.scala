package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: one-shot quality report for a scale factor.
  * `runMain graft.DebugQuality <sfDir>` prints precision/recall/F1 for the
  * greedy clusterer (pairwise E-1 + paired E-2), the CC baseline, and the
  * recall ceilings (C-10 diagnostics), sharing the memoized stage cache so
  * the pipeline runs once.
  */
object DebugQuality {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val evals = Seq(
      "q_eval_greedy", "q_eval_paired_greedy",
      "q_eval_upper_bound", "q_recall_ceiling_paired",
      "q_eval_cc", "q_eval_gold_sanity", "q_corpus_stats")
    for (q <- evals if SparkEntry.queries.contains(q)) {
      val t0 = System.nanoTime()
      val row = SparkEntry.queries(q)(spark, dir).collect().head
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$q%-28s $row  (${dt}%.1fs)")
    }
    spark.stop()
  }
}
