package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Round-6 optimization harness — SEPARATE from the frozen Bench contract
  * (guide §1: measure first, isolate with the noop sink, capture plans).
  *
  * Modes (args(0)):
  *   plans <sfDir> <outDir>   — dump .explain("formatted") for every
  *                              declared query into <outDir>/<q>.txt
  *   block <sfDir> <K> [n]    — replicate tokens K x (exactly like Bench's
  *                              scaling section) and time
  *                              Blocking.candidates via the noop sink,
  *                              n samples (default 3), local[cpus]
  *   blockc <sfDir> <K> <execs> [n] — same, in local-cluster[execs,1,3072]
  *                              (the frozen Bench's scaling mode)
  *   kernel <sfDir> [n]       — time the JW+Lev+ME scoring expressions over
  *                              the materialized 16x joined pair table
  *   stages <sfDir>           — time mentions/tokens/cc/greedy in isolation
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def clusterSession(execs: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local-cluster[$execs,1,3072]")
      .appName(s"graft-bench-extra-cluster-$execs")
      .config("spark.executor.extraClassPath",
        s"${sys.props("user.dir")}/target/scala-2.13/classes")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Bench's K x token replication (disjoint namespaces). */
  private def replicate(spark: SparkSession, tokensPath: String, k: Int,
      parts: Int): String = {
    import org.apache.spark.sql.functions._
    val out = tokensPath + s"_x$k"
    if (!Files.exists(Paths.get(out))) {
      val r = spark.range(k).toDF("r")
      spark.read.parquet(tokensPath).crossJoin(r)
        .withColumn("mention_id", col("mention_id") + col("r") * lit(1000000000L))
        .withColumn("token", concat(col("token"), lit("~"), col("r")))
        .withColumn("name", concat(col("name"), lit("~"), col("r")))
        .drop("r")
        .repartition(parts)
        .write.mode("overwrite").parquet(out)
    }
    out
  }

  private def writeTokens(spark: SparkSession, sfDir: String, base: String): Unit =
    if (!Files.exists(Paths.get(base)))
      pipeline.Tokenize.tokens(
        pipeline.Canonicalize.mentions(synth.Synth.transcripts(spark, sfDir)))
        .write.mode("overwrite").parquet(base)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    args(0) match {
      case "plans" =>
        val sfDir = args(1); val outDir = args(2)
        Files.createDirectories(Paths.get(outDir))
        val spark = session(cpus)
        for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(s"$outDir/$name.txt"),
            plan.getBytes(StandardCharsets.UTF_8))
          println(s"wrote $outDir/$name.txt")
        }
        // the blocking stage's standalone plan (as the scaling sections and
        // the 64x/256x curves run it: straight from a tokens parquet)
        val base = "/tmp/graft_extra/tokens"
        writeTokens(spark, sfDir, base)
        val bplan = pipeline.Blocking.candidates(spark.read.parquet(base))
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(s"$outDir/blocking_from_parquet.txt"),
          bplan.getBytes(StandardCharsets.UTF_8))
        println(s"wrote $outDir/blocking_from_parquet.txt")
        spark.stop()

      case "block" =>
        val sfDir = args(1); val k = args(2).toInt
        val n = if (args.length > 3) args(3).toInt else 3
        val spark = session(cpus)
        val base = "/tmp/graft_extra/tokens"
        writeTokens(spark, sfDir, base)
        val scaled = replicate(spark, base, k, math.max(64, k / 4))
        val t = spark.read.parquet(scaled)
        force(t) // warm page cache untimed, like Bench
        spark.sparkContext.setJobDescription(s"block ${k}x")
        val samples = Seq.fill(n)(time(force(pipeline.Blocking.candidates(t))))
        println(f"block ${k}x samples=${samples.map(v => f"$v%.2f").mkString(",")} min=${samples.min}%.3f")
        spark.stop()

      case "blockc" =>
        val sfDir = args(1); val k = args(2).toInt; val execs = args(3).toInt
        val n = if (args.length > 4) args(4).toInt else 3
        val prep = session(cpus)
        val base = "/tmp/graft_extra/tokens"
        writeTokens(prep, sfDir, base)
        val scaled = replicate(prep, base, k, math.max(64, k / 4))
        prep.stop()
        val spark = clusterSession(execs)
        val t = spark.read.parquet(scaled)
        force(t)
        val samples = Seq.fill(n)(time(force(pipeline.Blocking.candidates(t))))
        println(f"blockc ${k}x execs=$execs samples=${samples.map(v => f"$v%.2f").mkString(",")} min=${samples.min}%.3f")
        spark.stop()

      case "blockprof" =>
        val sfDir = args(1); val k = args(2).toInt
        val spark = session(cpus)
        import org.apache.spark.sql.functions._
        val base = "/tmp/graft_extra/tokens"
        writeTokens(spark, sfDir, base)
        val scaled = replicate(spark, base, k, math.max(64, k / 4))
        val t = spark.read.parquet(scaled)
        force(t)
        val tArr = time(force(pipeline.Blocking.tokenArrays(t)))
        val tPairs = time(force(pipeline.Blocking.scoredPairs(t)))
        val nPairs = pipeline.Blocking.scoredPairs(t).count()
        val tCand = time(force(pipeline.Blocking.candidates(t)))
        println(f"blockprof ${k}x arr=$tArr%.2f pairs=$tPairs%.2f ($nPairs) cand=$tCand%.2f")
        spark.stop()

      case "kernel" =>
        val sfDir = args(1)
        val n = if (args.length > 2) args(2).toInt else 3
        val spark = session(cpus)
        import org.apache.spark.sql.functions._
        graft.functions.GraftFunctions.register(spark)
        val base = "/tmp/graft_extra/tokens"
        writeTokens(spark, sfDir, base)
        val scaled = replicate(spark, base, 16, 64)
        val joined = "/tmp/graft_extra/joined_x16"
        if (!Files.exists(Paths.get(joined))) {
          val t = spark.read.parquet(scaled)
          val names = t.select(col("mention_id"), col("name")).distinct()
          pipeline.Blocking.scoredPairs(t)
            .join(names.select(col("mention_id").as("dst_id"), col("name").as("dst_name"))
              .hint("SHUFFLE_HASH"), "dst_id")
            .join(names.select(col("mention_id").as("org_id"), col("name").as("org_name"))
              .hint("SHUFFLE_HASH"), "org_id")
            .select(col("dst_name"), col("org_name"))
            .crossJoin(spark.range(2).toDF("rj")).drop("rj")
            .repartition(64)
            .write.mode("overwrite").parquet(joined)
        }
        val pairs = spark.read.parquet(joined)
        val cnt = pairs.count()
        def kern() = pairs.select(
          expr("graft_jaro_winkler(dst_name, org_name)").as("jw"),
          levenshtein(col("dst_name"), col("org_name")).as("lev"),
          expr("graft_monge_elkan(dst_name, org_name)").as("me"))
        force(kern()) // warm-up
        val samples = Seq.fill(n)(time(force(kern())))
        println(f"kernel pairs=$cnt samples=${samples.map(v => f"$v%.2f").mkString(",")} " +
          f"min=${samples.min}%.3f pairs/s=${cnt / samples.min}%.0f")
        spark.stop()

      case "stages" =>
        val sfDir = args(1)
        val spark = session(cpus)
        import org.apache.spark.sql.functions._
        val tM = time(force(pipeline.Canonicalize.mentions(
          synth.Synth.transcripts(spark, sfDir))))
        val m = pipeline.Canonicalize.mentions(
          synth.Synth.transcripts(spark, sfDir)).localCheckpoint()
        val tT = time(force(pipeline.Tokenize.tokens(m)))
        val tk = pipeline.Tokenize.tokens(m).localCheckpoint()
        val tB = time(force(pipeline.Blocking.candidates(tk)))
        val cand = pipeline.Blocking.candidates(tk).localCheckpoint()
        val tCc = time(force(pipeline.ConnectedComponents.assignments(m, cand)))
        val tG = time(force(pipeline.GreedyClustering.assignments(m, tk, cand)))
        println(f"stages mentions=$tM%.2f tokens=$tT%.2f block=$tB%.2f cc=$tCc%.2f greedy=$tG%.2f")
        spark.stop()

      case other => sys.error(s"unknown mode $other")
    }
  }
}
