package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))

  test("exact dedup groups identical texts, keeps min id") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val out = TextDedup.exactDups(d).select($"doc_id", $"keep_id", $"is_dup")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === (1L, false))
    assert(out(2L) === (1L, true))
    assert(out(3L) === (3L, false))
  }

  test("minhash LSH finds near-duplicates, jaccard exact on shingles") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text with no overlap at all whatsoever"))
    val pairs = TextDedup.ngramJaccard(d).as[(Long, Long, Long, Long, Long, Double)].collect()
    val p12 = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(p12.isDefined, "near-dup pair (1,2) must survive LSH")
    assert(p12.get._6 > 0.5)
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
    // identical docs -> jaccard 1.0
    val ident = TextDedup.ngramJaccard(docs((1L, "a b c d e"), (2L, "a b c d e")))
      .select($"jaccard").as[Double].collect()
    assert(ident.toSeq === Seq(1.0))
  }

  test("simhash: identical docs share fingerprints, disjoint docs differ") {
    val d = docs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota"))
    val out = TextDedup.simhash(d).as[(Long, Long)].collect().toMap
    assert(out(1L) === out(2L))
    assert(out(1L) !== out(3L))
  }

  test("ANN via LSH buckets: useful recall at a fraction of the cross join") {
    // these synthetic embeddings are near-random (median top-1 cosine
    // ~0.36) — the WORST case for hyperplane LSH; clustered real data
    // recalls far higher at the same parameters.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val brute = Similarity.knnBrute(emb, k = 1)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val ann = Similarity.annTopK(emb, k = 1)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val recall = brute.count { case (v, c) => ann.get(v).contains(c) }.toDouble / brute.size
    assert(recall > 0.25, s"top-1 recall $recall")
    // pruning: candidate pairs examined must stay well under the cross join
    val sigs = Similarity.lshSignatures(emb)
    val candPairs = sigs.as("x").join(sigs.as("y"), Seq("t", "sig"))
      .filter($"x.vec_id" =!= $"y.vec_id")
      .select($"x.vec_id", $"y.vec_id").distinct().count()
    assert(candPairs < n * n / 3, s"LSH examined $candPairs of ${n * n} pairs")
  }

  test("token counts and fingerprints are deterministic and sane") {
    val d = docs((1L, "one two three"), (2L, "one two three"))
    val tc = TextAnalysis.tokenCounts(d).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(tc(1L) === (3L, 3L))
    val fp = TextAnalysis.fingerprints(d).as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) > 0L)
  }

  test("quality score rewards long clean text") {
    val d = docs((1L, Seq.fill(60)("steady").mkString(" ")), (2L, "!!! ??? ..."))
    val q = TextAnalysis.qualityScore(d)
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    assert(q(1L) > q(2L))
  }

  test("media decode plumbing produces per-row features") {
    val d = docs((7L, "abcdef"))
    val f = Multimodal.decodeFeatures(Multimodal.mediaTable(d)).collect().head
    assert(f.doc_id === 7L)
    assert(f.n_bytes === 6L)
    assert(f.sum_bytes === "abcdef".map(_.toLong).sum)
  }
}
