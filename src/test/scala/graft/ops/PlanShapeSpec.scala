package graft.ops

import graft.SparkSpec

/** Physical-plan regression guards for the scale-critical operator shapes:
  * the properties the 100-TB design depends on, asserted so a refactor
  * that silently reintroduces a shuffle or a row explosion fails CI.
  */
class PlanShapeSpec extends SparkSpec {

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countExchanges(plan: String): Int =
    "(?i)exchange".r.findAllIn(plan).length

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("ivfProbes: probe assignment is a shuffle-free projection") {
    val plan = physical(Similarity.ivfProbes(emb, nlist = 8, nprobe = 3))
    assert(countExchanges(plan) == 0,
      s"IVF probe assignment must not shuffle; plan:\n$plan")
  }

  test("minhashSignatures: exactly one shuffle (the per-doc aggregate)") {
    val plan = physical(TextDedup.minhashSignatures(docs))
    assert(countExchanges(plan) == 1,
      s"single-pass MinHash must shuffle once (wide partial agg); plan:\n$plan")
  }

  test("simhash: exactly one shuffle, no row-expansion join") {
    val plan = physical(TextDedup.simhash(docs))
    assert(countExchanges(plan) == 1, s"plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"simhash must not cross-join a bit range; plan:\n$plan")
  }

  test("exactDups: agg+join, no WindowExec (hot hash-group must not be buffered)") {
    val plan = physical(TextDedup.exactDups(docs))
    assert(!plan.contains("Window"),
      s"exactDups must not sort-buffer dup groups in a Window; plan:\n$plan")
  }

  test("capGroups valve: agg+semi-join, no WindowExec (hot bucket must not be buffered)") {
    val plan = physical(
      TextDedup.lshPairs(docs, maxBucket = Some(10)))
    assert(!plan.contains("Window"),
      s"the hot-bucket valve must not sort-buffer the hot bucket; plan:\n$plan")
  }

  test("q_phonetic_baseline: agg+join, no WindowExec (hot soundex group must not be buffered)") {
    val plan = physical(
      graft.SparkEntry.queries("q_phonetic_baseline")(spark, "/root/testdata/sf0.001"))
    assert(!plan.contains("Window"),
      s"phonetic baseline must not sort-buffer code groups in a Window; plan:\n$plan")
  }

  test("lang-id / quality / token-count / fingerprint are single-scan, zero-shuffle") {
    Seq(
      TextAnalysis.langId(docs),
      TextAnalysis.qualityScore(docs),
      TextAnalysis.tokenCounts(docs),
      TextAnalysis.fingerprints(docs)
    ).foreach { df =>
      val plan = physical(df)
      assert(countExchanges(plan) == 0, s"plan:\n$plan")
    }
  }
}
