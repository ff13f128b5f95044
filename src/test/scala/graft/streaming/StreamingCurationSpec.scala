package graft.streaming

import graft.SparkSpec
import graft.ops.{Curation, TextAnalysis, TextDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingCurationSpec extends SparkSpec {

  private val t0 = 1735689600000L
  private def ts(min: Int) = new Timestamp(t0 + min * 60000L)

  test("streaming curation signals are numerically identical to the batch operators") {
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200).localCheckpoint()
    // benchmark overlapping the corpus so contamination is non-trivially exercised
    val bench = docs.limit(5).select(col("doc_id"), col("text")).localCheckpoint()

    val got = StreamingCuration.signals(docs, bench)
      .select($"doc_id", $"lang_pred", $"quality", $"top_word_ratio",
        $"dup_3gram_ratio", $"shingle_cnt", $"contaminated_cnt",
        $"contamination", $"is_contaminated")
      .as[(Long, String, Double, Double, Double, Long, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    val lang = TextAnalysis.langId(docs).select($"doc_id", $"lang_pred")
      .as[(Long, String)].collect().toMap
    val qual = TextAnalysis.qualityScore(docs).select($"doc_id", $"quality")
      .as[(Long, Double)].collect().toMap
    val rep = TextAnalysis.repetition(docs)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val dec = TextDedup.decontaminate(docs, bench)
      .select($"doc_id", $"contaminated_cnt", $"shingle_cnt",
        $"contamination", $"is_contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap

    assert(got.size === 200)
    assert(dec.values.count(_._5) >= 5, "the 5 bench docs must self-contaminate")
    got.foreach { case (id, g) =>
      assert(g._2 === lang(id), s"lang_pred doc $id")
      assert(g._3 === qual(id), s"quality doc $id")
      assert((g._4, g._5) === (rep(id)._2, rep(id)._3), s"repetition doc $id")
      assert((g._7, g._6, g._8, g._9) ===
        (dec(id)._2, dec(id)._3, dec(id)._4, dec(id)._5), s"decontam doc $id")
    }
  }

  test("streaming keepSet emits one verdict per doc with batch reason priority") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 20 distinct words, one stopword: en, quality >= 0.5, twr 0.05 -> kept
    val docA = "the alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra"
    val bench = "a zero one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    val benchDf = Seq((100L, bench)).toDF("doc_id", "text")

    val in = MemoryStream[(Long, String, Timestamp)]
    val verdicts = StreamingCuration.keepSet(
      in.toDF().toDF("doc_id", "text", "ts"), benchDf)
    val q = verdicts
      .writeStream.format("memory").queryName("curation_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, docA, ts(0)))
      q.processAllAvailable()
      in.addData(
        (2L, docA, ts(1)),                 // exact dup of the founder
        (3L, docA + " tango", ts(1)),      // near dup (all 4 bands collide)
        (4L, "der die das und ist zu im mit auf ein", ts(1)),  // German
        (5L, "the a is to in", ts(1)),     // en but quality 0.415 < 0.5
        (6L, Seq.fill(5)("the cat sat on the mat").mkString(" "), ts(1)), // twr 0.33
        (7L, bench, ts(1)))                // contaminated (18 shared shingles)
      q.processAllAvailable()
      // advance the watermark past the docs' windows so append emits
      in.addData((99L, "late watermark flush doc", ts(40)))
      q.processAllAvailable()
      // the memory sink registers in the session the verdict frame is bound
      // to (keepSet scopes its conf override to a child session)
      val out = verdicts.sparkSession.table("curation_out")
        .select($"doc_id", $"keep", $"reason")
        .as[(Long, Boolean, String)].collect().map(r => r._1 -> r).toMap
      assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
      assert(out(1L) === ((1L, true, "kept")))
      assert(out(2L) === ((2L, false, "exact_dup")))
      assert(out(3L) === ((3L, false, "near_dup")))
      assert(out(4L) === ((4L, false, "lang")))
      assert(out(5L) === ((5L, false, "quality")))
      assert(out(6L) === ((6L, false, "repetition")))
      assert(out(7L) === ((7L, false, "contaminated")))
      // the dropped-doc operational signal: cumulative docs_in vs
      // verdicts_out from the query's observed metrics. 8 docs entered
      // (incl. the watermark-flush doc), 7 verdicts closed — the gap IS
      // the signal consumers watch (here the flush doc's still-open
      // window; at the lateness horizon it would be a silent drop).
      def metricSum(name: String, field: String): Long =
        q.recentProgress.toSeq
          .flatMap(p => Option(p.observedMetrics.get(name)))
          .map(r => r.getLong(r.fieldIndex(field))).sum
      assert(metricSum("graft_curation_in", "docs_in") === 8L)
      assert(metricSum("graft_curation_out", "verdicts_out") === 7L)
    } finally q.stop()

    // the streaming reason priority is the BATCH priority: the same seven
    // docs through the batch operator give the same verdicts (founder = 1
    // is also the batch min-id representative here by construction)
    val batchDocs = Seq(
      (1L, docA), (2L, docA), (3L, docA + " tango"),
      (4L, "der die das und ist zu im mit auf ein"),
      (5L, "the a is to in"),
      (6L, Seq.fill(5)("the cat sat on the mat").mkString(" ")),
      (7L, bench)).toDF("doc_id", "text")
      .withColumn(
        "lang", org.apache.spark.sql.functions.lit("en")) // passthrough col
    val batch = Curation.keepSet(batchDocs, benchDf)
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> r._3).toMap
    assert(batch === Map(1L -> "kept", 2L -> "exact_dup", 3L -> "near_dup",
      4L -> "lang", 5L -> "quality", 6L -> "repetition", 7L -> "contaminated"))
  }

  test("streaming keepSet degrades corrupt rows (NULL id / NULL ts) instead of dying") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docA = "the alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra"
    val benchDf = Seq((100L, "zero one two")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String, Timestamp)]
    // marker ids become NULLs in the plan (a MemoryStream tuple cannot
    // carry null primitives): 9001 = NULL doc_id (would throw in the
    // BucketSig encoder), 9002 = NULL event time (would NPE founderFold)
    import org.apache.spark.sql.functions.{when => w, lit => l}
    val raw = in.toDF().toDF("doc_id", "text", "ts")
      .withColumn("ts", w(col("doc_id") === 9002L, l(null).cast("timestamp"))
        .otherwise(col("ts")))
      .withColumn("doc_id", w(col("doc_id") === 9001L, l(null).cast("bigint"))
        .otherwise(col("doc_id")))
    val verdicts = StreamingCuration.keepSet(raw, benchDf)
    val q = verdicts.writeStream.format("memory").queryName("curation_corrupt_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, docA, ts(0)), (9001L, docA, ts(0)), (9002L, docA, ts(0)))
      q.processAllAvailable() // would throw the poison pill without the guard
      in.addData((99L, "late watermark flush doc", ts(40)))
      q.processAllAvailable()
      assert(q.isActive)
      val out = verdicts.sparkSession.table("curation_corrupt_out")
        .select($"doc_id", $"keep", $"reason")
        .as[(Long, Boolean, String)].collect().map(r => r._1 -> r).toMap
      assert(out.keySet === Set(1L)) // clean doc verdicted, corrupt dropped
      assert(out(1L) === ((1L, true, "kept")))
    } finally q.stop()
  }

  test("keepSetBatch (the oracle twin) reproduces the streaming founder verdicts") {
    val spark2 = spark
    import spark2.implicits._
    val docA = "the alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra"
    val bench = "a zero one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    val benchDf = Seq((100L, bench)).toDF("doc_id", "text")
    // same seven docs as the streaming test, arrival order = doc_id order
    // (ts = timestamp_seconds(doc_id), the q_stream_keepset convention)
    val docs = Seq(
      (1L, docA), (2L, docA), (3L, docA + " tango"),
      (4L, "der die das und ist zu im mit auf ein"),
      (5L, "the a is to in"),
      (6L, Seq.fill(5)("the cat sat on the mat").mkString(" ")),
      (7L, bench)).toDF("doc_id", "text")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_seconds(col("doc_id")))
    val got = StreamingCuration.keepSetBatch(docs, benchDf)
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got === Map(1L -> "kept", 2L -> "exact_dup", 3L -> "near_dup",
      4L -> "lang", 5L -> "quality", 6L -> "repetition", 7L -> "contaminated"))
  }

  test("keepSetBatch verdicts NULL-text docs (totality) — never exact-merged") {
    val spark2 = spark
    import spark2.implicits._
    val docA = "the alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra"
    val benchDf = Seq((100L, "nothing shared at all here truly")).toDF("doc_id", "text")
    // md5(NULL) is NULL: without a per-doc anchor fallback the batch
    // twin's equi-join on (band, key) silently drops the doc — while the
    // streaming groupByKey still verdicts it (parity + totality break)
    val docs = Seq((1L, docA), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_seconds(col("doc_id")))
    val got = StreamingCuration.keepSetBatch(docs, benchDf)
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got.keySet === Set(1L, 2L, 3L), s"totality broken: $got")
    assert(got(1L) === "kept")
    // two null-text docs are each their own founder (unique anchors): not
    // exact-flagged — unscorable signals fail them with a named reason
    assert(got(2L) === "lang" && got(3L) === "lang")
  }
}
