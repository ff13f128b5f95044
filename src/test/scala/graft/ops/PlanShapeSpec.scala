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

  test("stratifiedSample: broadcast fraction join, corpus never shuffles") {
    import spark.implicits._
    val fractions = Seq(("src0", 0.5), ("src1", 0.9)).toDF("source", "fraction")
    val plan = physical(Sampling.stratifiedSample(docs, fractions))
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("hashpartitioning"),
      s"the corpus side must not shuffle for a broadcast fraction join; plan:\n$plan")
  }

  test("corpusMix: only the strata-count aggregate shuffles; corpus joins broadcast") {
    import spark.implicits._
    val weights = Seq(("src0", 1.0), ("src1", 2.0)).toDF("source", "weight")
    val plan = physical(Sampling.corpusMix(docs, weights))
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus mixing must broadcast the fraction table, never sort-merge; plan:\n$plan")
  }

  test("packSequences: the corpus window is PARTITIONED (by range bucket)") {
    val plan = physical(Sampling.packSequences(docs))
    // every Window node over corpus rows must carry a partition spec; the
    // only unpartitioned window in the design runs on the <= nBuckets
    // offsets frame, which is joined back by BROADCAST — so the corpus
    // branch must show a partitioned Window + a broadcast join, and no
    // sort-merge join anywhere
    val windows = "Window \\[.*?\\], \\[(.*?)\\], \\[".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(windows.exists(_.contains("bkt")),
      s"expected a bkt-partitioned Window over the corpus; plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"bucket offsets must broadcast back; plan:\n$plan")
  }

  test("leakageSafeSplit over a precomputed cluster table is shuffle-free") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_id")
    val plan = physical(Sampling.leakageSafeSplit(docs, clustersDf = Some(clusters)))
    assert(countExchanges(plan) == 0,
      s"the split is one hash projection — no shuffle; plan:\n$plan")
  }

  test("shuffleShards: zero-shuffle projection") {
    val plan = physical(Sampling.shuffleShards(docs, 8))
    assert(countExchanges(plan) == 0,
      s"the shuffle assignment is one hash projection — no shuffle; plan:\n$plan")
  }

  test("dedupIncremental: prior index probed via broadcast, no Window, no cartesian") {
    val idx = TextDedup.signatureIndex(docs)
    val plan = physical(TextDedup.dedupIncremental(
      docs.filter("doc_id % 5 = 0"),
      priorIndex = idx.filter("doc_id % 5 <> 0"),
      incomingIndexDf = Some(idx.filter("doc_id % 5 = 0"))))
    assert(plan.contains("BroadcastHashJoin"),
      s"the corpus-sized prior index must be probed with broadcast new-batch keys; plan:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"plan:\n$plan")
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
