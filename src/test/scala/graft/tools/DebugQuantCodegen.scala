package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: which composed plan trips the whole-stage-codegen compile
  * cliff (InternalCompilerException -> interpreted fallback) seen in the
  * round-5 bench smoke. Runs each suspect in isolation with codegen
  * fallback DISABLED so the failing stage throws instead of silently
  * degrading. */
object DebugQuantCodegen {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def probe(name: String)(f: => Long): Unit =
      try println(s"OK   $name rows=" + f)
      catch { case e: Throwable =>
        println(s"FAIL $name: ${e.getClass.getSimpleName}: " +
          e.getMessage.linesIterator.take(2).mkString(" | ")) }
    probe("lshSignatures")(ops.Similarity.lshSignatures(emb).count())
    locally { // the recall-vs-n synthetic family at its largest point —
      // the ONE generator Bench measures with (constants and hash family
      // included), so this probe cannot drift from what the bench runs
      import spark.implicits._
      val synth = Bench.synthEmbeddings(spark, 50000).localCheckpoint()
      probe("annCandidates(synth50k)")(
        ops.Similarity.annCandidates(synth).count())
      // the inline-IVF path at its widest (autoNlist(50000) = 223 <= 256
      // inlined 64-dim centroid arrays): second candidate for a silent
      // janino cliff
      probe("ivfTrained(synth50k)")(
        ops.Similarity.ivfTopKTrained(synth,
          queries = Some(synth.filter($"vec_id" < 200))).count())
    }
    probe("quantize")(ops.Similarity.quantize(emb).count())
    probe("roundtrip")(ops.Similarity.quantizeRoundtrip(emb).count())
    probe("knnBrute(roundtrip)")(
      ops.Similarity.knnBrute(ops.Similarity.quantizeRoundtrip(emb)).count())
    probe("ivfTrained(roundtrip)")(
      ops.Similarity.ivfTopKTrained(ops.Similarity.quantizeRoundtrip(emb)).count())
    locally {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val benchC = docs.filter(col("doc_id") % 97 === 0)
      val weights = docs.select(col("source")).distinct()
        .withColumn("weight", lit(1.0))
      probe("assembleDataset")(
        Presets.assembleDataset(docs, benchC, weights).count())
    }
    spark.stop()
  }
}
