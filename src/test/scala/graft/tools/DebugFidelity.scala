package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fidelity experiment: pairwise F1 of the PRODUCTION clustering (strong
  * cores + loner chaining + attachment rounds for oversized components)
  * against the EXACT reference algorithm (whole-component BFS, i.e.
  * maxComponentSize = infinity — single-task per component, intractable at
  * production scale but runnable offline at bench scale). This measures the
  * north rule's "pairwise F1 >= 0.99 vs the reference's clusters" directly:
  * the exact run IS the reference algorithm's output on this corpus.
  *
  * `runMain graft.DebugFidelity <sfDir>`
  */
object DebugFidelity {
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
    import graft.pipeline._
    import graft.synth.Synth

    val mentions = Canonicalize.mentions(Synth.transcripts(spark, dir)).localCheckpoint()
    val tokens = Tokenize.tokens(mentions).localCheckpoint()
    val candidates = Blocking.candidates(tokens).localCheckpoint()

    val t0 = System.nanoTime()
    val exact = GreedyClustering.assignments(mentions, tokens, candidates,
      maxComponentSize = Int.MaxValue)
      .select(col("mention_id"), col("name"), col("weight"), col("cluster_id"))
      .localCheckpoint()
    val tExact = (System.nanoTime() - t0) / 1e9
    println(f"exact reference BFS: ${exact.count()} refs in $tExact%.1f s")

    val t1 = System.nanoTime()
    val prod = GreedyClustering.assignments(mentions, tokens, candidates)
      .select(col("mention_id"), col("name"), col("weight"), col("cluster_id"))
      .localCheckpoint()
    val tProd = (System.nanoTime() - t1) / 1e9
    println(f"production clustering: ${prod.count()} refs in $tProd%.1f s")

    // exact clusters as the "gold" labeling: (name, entity_id, cnt)
    val exactAsGold = exact.select(col("name"),
      col("cluster_id").cast("string").as("entity_id"), col("weight").as("cnt"))
    val fidelity = Evaluation.pairwiseF1(prod, exactAsGold).collect().head
    println(s"FIDELITY (production vs exact reference clusters): $fidelity")
    spark.stop()
  }
}
