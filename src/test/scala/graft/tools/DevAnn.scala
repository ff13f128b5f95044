package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Ad-hoc ANN timing/recall probe at a given sf dir (dev aid, test scope). */
object DevAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").localCheckpoint()
    val n = emb.count()
    println(s"n=$n planes=${Similarity.autoPlanes(n)} tables=${Similarity.autoTables(Similarity.autoPlanes(n))} nlist=${Similarity.autoNlist(n)}")
    val brute = Similarity.knnBrute(emb).select(col("vec_id"), col("neighbor_id")).localCheckpoint()
    val bruteN = brute.count()
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      brute.join(df.select(col("vec_id"), col("neighbor_id")),
        Seq("vec_id", "neighbor_id"), "left_semi").count().toDouble / bruteN
    var ann: org.apache.spark.sql.DataFrame = null
    val tAnn = time { ann = Similarity.annTopK(emb).localCheckpoint() }
    println(f"annTopK auto: $tAnn%.2f s recall@5=${recall(ann)}%.4f")
    var ivf: org.apache.spark.sql.DataFrame = null
    val tIvf = time { ivf = Similarity.ivfTopK(emb).localCheckpoint() }
    println(f"ivfTopK auto: $tIvf%.2f s recall@5=${recall(ivf)}%.4f")
    var ivfT: org.apache.spark.sql.DataFrame = null
    val tIvfT = time { ivfT = Similarity.ivfTopKTrained(emb).localCheckpoint() }
    println(f"ivfTopKTrained auto: $tIvfT%.2f s recall@5=${recall(ivfT)}%.4f")
    var ivf8: org.apache.spark.sql.DataFrame = null
    val tIvf8 = time { ivf8 = Similarity.ivfTopK(emb, nprobe = 8).localCheckpoint() }
    println(f"ivfTopK nprobe8: $tIvf8%.2f s recall@5=${recall(ivf8)}%.4f")
    spark.stop()
  }
}
