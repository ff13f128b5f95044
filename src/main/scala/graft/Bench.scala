package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Round benchmark. Prints ONE JSON line (driver contract) and refreshes
  * BENCH.md with the scaling table.
  *
  * Metrics:
  *  - per-query wall seconds on SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS
  *    (headline operators, each forced with a noop sink);
  *  - scored-pairs/sec of the blocking+scoring core at TWO parallelism
  *    levels, local[N] and local[4N] on identical input — the sandbox
  *    stand-in for the N->4N executor scaling rule — plus efficiency
  *    = (T_N / T_4N) / 4.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** The blocking+scoring core (J-1 self-join + A-1 aggregation +
    * thresholds): the dominant shuffle at scale and the unit of the
    * throughput metric. */
  private def blockCore(spark: SparkSession, sfDir: String): DataFrame = {
    val t = pipeline.Tokenize.tokens(
      pipeline.Canonicalize.mentions(synth.Synth.transcripts(spark, sfDir)))
    pipeline.Blocking.candidates(t)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusHi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cpusLo = math.max(cpusHi / 4, 1)

    // ---- phase 1: headline query timings at full parallelism
    var spark = session(cpusHi)
    val headline = Seq("q_mentions", "q_tokens", "q_candidates",
      "q_candidates_hybrid", "q_cc_assignments", "q_greedy_assignments",
      "q_eval_greedy", "q_sim_graph_edges")
    val qTimes = headline.map { name =>
      val fn = SparkEntry.queries(name)
      name -> time(force(fn(spark, sfDir)))
    }

    // scored-pairs numerator: pre-threshold aggregated candidate pairs
    val sc = pipeline.Blocking.scored(pipeline.Tokenize.tokens(
      pipeline.Canonicalize.mentions(synth.Synth.transcripts(spark, sfDir))))
    val pairsScored = {
      import org.apache.spark.sql.functions._
      sc.as("a").join(sc.as("b"), "token")
        .filter(col("a.mention_id") =!= col("b.mention_id"))
        .groupBy(col("a.mention_id"), col("b.mention_id")).count().count()
    }

    val tHi = time(force(blockCore(spark, sfDir)))
    spark.stop()

    // ---- phase 2: same core at quarter parallelism
    spark = session(cpusLo)
    val tLo = time(force(blockCore(spark, sfDir)))
    spark.stop()

    val thrHi = pairsScored / tHi
    val thrLo = pairsScored / tLo
    val efficiency = (tLo / tHi) / (cpusHi.toDouble / cpusLo)
    val total = qTimes.map(_._2).sum
    val qs = qTimes.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")

    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","scored_pairs":$pairsScored,""" +
        s""""cpus_lo":$cpusLo,"cpus_hi":$cpusHi,""" +
        s""""block_sec_lo":${f"$tLo%.3f"},"block_sec_hi":${f"$tHi%.3f"},""" +
        s""""pairs_per_sec_lo":${f"$thrLo%.0f"},"pairs_per_sec_hi":${f"$thrHi%.0f"},""" +
        s""""scaling_efficiency":${f"$efficiency%.3f"}}""")

    val md =
      s"""# BENCH — latest round
         |
         |Input: `$sfDir` (synthesized transcripts derived from customer keys).
         |
         |## Headline operator timings (local[$cpusHi])
         |
         || query | sec |
         || --- | --- |
         |${qTimes.map { case (k, v) => s"| $k | ${f"$v%.3f"} |" }.mkString("\n")}
         |
         |## Scaling (blocking+scoring core, identical input)
         |
         |Scored pairs (pre-threshold aggregated candidate pairs): $pairsScored
         |
         || parallelism | wall sec | scored pairs/sec |
         || --- | --- | --- |
         || local[$cpusLo] | ${f"$tLo%.3f"} | ${f"$thrLo%.0f"} |
         || local[$cpusHi] | ${f"$tHi%.3f"} | ${f"$thrHi%.0f"} |
         |
         |Scaling efficiency local[$cpusLo] -> local[$cpusHi]
         |(= (T_N / T_4N) / (4N/N)): **${f"$efficiency%.3f"}** (target >= 0.8).
         |""".stripMargin
    try Files.write(Paths.get("BENCH.md"), md.getBytes(StandardCharsets.UTF_8))
    catch { case _: Throwable => }
  }
}
