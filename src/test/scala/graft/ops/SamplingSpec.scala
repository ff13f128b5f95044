package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))

  private def corpus(n: Int, src: Long => String) =
    docs((0L until n.toLong).map(i => (i, s"doc $i body", src(i))): _*)

  test("hashU: deterministic, uniform-ish, in [0,1)") {
    val d = corpus(2000, _ => "s")
    val us = d.select(Sampling.hashU($"doc_id", "graft").as("u"))
      .as[Double].collect()
    assert(us.forall(u => u >= 0.0 && u < 1.0))
    val us2 = d.select(Sampling.hashU($"doc_id", "graft").as("u"))
      .as[Double].collect()
    assert(us.toSeq === us2.toSeq) // pure function of (doc_id, salt)
    val mean = us.sum / us.length
    assert(math.abs(mean - 0.5) < 0.03, s"mean $mean far from uniform")
    // a different salt draws an (almost entirely) different sample
    val usB = d.select(Sampling.hashU($"doc_id", "other").as("u")).as[Double].collect()
    assert(us.zip(usB).count { case (a, b) => a == b } < 3)
  }

  test("stratifiedSample: per-stratum fractions honored, 1.0 total, 0.0 empty") {
    val d = corpus(3000, i => s"src${i % 3}") // 1000 docs per stratum
    val fractions = Seq(("src0", 1.0), ("src1", 0.4), ("src2", 0.0))
      .toDF("source", "fraction")
    val by = Sampling.stratifiedSample(d, fractions)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(by("src0") === 1000L)             // fraction 1.0 keeps the stratum whole
    assert(!by.contains("src2"))             // fraction 0.0 keeps nothing
    assert(math.abs(by("src1") - 400L) < 60) // binomial tolerance at n=1000
    // a stratum absent from the fraction table is dropped (inner join)
    val part = Sampling.stratifiedSample(d, Seq(("src0", 1.0)).toDF("source", "fraction"))
    assert(part.select($"source").distinct().as[String].collect().toSeq === Seq("src0"))
  }

  test("corpusMix: bottleneck stratum taken whole, proportions match targets") {
    // counts 600/1200/1200; weights 2/1/1 -> capacity T = min(600/2, 1200/1,
    // 1200/1) = 300 -> fractions 1.0 / 0.25 / 0.25 (src0 is the bottleneck)
    val d = corpus(3000, i => if (i % 5 < 1) "src0" else if (i % 5 < 3) "src1" else "src2")
    val weights = Seq(("src0", 2.0), ("src1", 1.0), ("src2", 1.0))
      .toDF("source", "weight")
    val out = Sampling.corpusMix(d, weights)
    val fr = out.groupBy($"source").agg(first($"fraction").as("f"), count(lit(1)).as("c"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fr("src0")._1 === 1.0)
    assert(fr("src0")._2 === 600L)
    assert(fr("src1")._1 === 0.25)
    assert(math.abs(fr("src1")._2 - 300L) < 50)
    assert(math.abs(fr("src2")._2 - 300L) < 50)
    // zero-weight strata are excluded entirely
    val noSrc2 = Sampling.corpusMix(d,
      Seq(("src0", 2.0), ("src1", 1.0), ("src2", 0.0)).toDF("source", "weight"))
    assert(!noSrc2.select($"source").distinct().as[String].collect().contains("src2"))
  }

  test("packSequences: prefix sums and pack coordinates; docs span chunks") {
    // token counts 4,4,4,4 at budget 10: starts 0,4,8,12 -> packs 0,0,0,1
    val d = docs((0L to 3L).map(i =>
      (i, Seq.fill(4)("tok").mkString(" "), "s")): _*)
    val out = Sampling.packSequences(d, budget = 10)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 4L, 4L, 0L, 0L),
      (1L, 4L, 8L, 0L, 4L),
      (2L, 4L, 12L, 0L, 8L),  // starts at 8 inside pack 0, spans into pack 1
      (3L, 4L, 16L, 1L, 2L)))
  }

  test("leakageSafeSplit: clusters are split-atomic, fractions roughly honored") {
    // two near-dup pairs (same text => same LSH buckets) + many singletons
    val nearDups = Seq(
      (10000L, "the quick brown fox jumps over the lazy dog today", "s"),
      (10001L, "the quick brown fox jumps over the lazy dog today", "s"),
      (10002L, "completely different words entirely unrelated to anything else", "s"),
      (10003L, "completely different words entirely unrelated to anything else", "s"))
    // every word carries the doc index, so word-3-gram shingles are
    // DISJOINT across docs (shared words like "unique text body" would
    // near-dup-cluster the whole fixture and skew the split fractions)
    val singles = (0L until 2000L).map(i =>
      (i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i", "s"))
    val d = docs((singles ++ nearDups): _*)
    val out = Sampling.leakageSafeSplit(d)
      .as[(Long, Long, String)].collect()
    val byDoc = out.map(r => r._1 -> (r._2, r._3)).toMap
    // near-dup mates inherit the cluster verdict — never straddle splits
    assert(byDoc(10000L) === byDoc(10001L)._1 -> byDoc(10001L)._2)
    assert(byDoc(10002L)._2 === byDoc(10003L)._2)
    // proportions over ~2000 effectively-singleton clusters
    val frac = out.groupBy(_._3).view.mapValues(_.length.toDouble / out.length).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03)
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.05) < 0.02)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.05) < 0.02)
    // deterministic: a rerun reproduces the identical assignment
    val again = Sampling.leakageSafeSplit(d).as[(Long, Long, String)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("shuffleShards: total, balanced, deterministic; shard order = global u order") {
    val d = corpus(4000, _ => "s")
    val out = Sampling.shuffleShards(d, numShards = 8)
      .as[(Long, Long, Double)].collect()
    assert(out.length === 4000 && out.map(_._1).distinct.length === 4000) // total
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    val byShard = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byShard.size === 8)
    assert(byShard.values.forall(c => c > 350 && c < 650), s"skewed: $byShard")
    // shard boundaries partition the u space: concatenating shards in order,
    // each sorted by sort_key, is one global permutation
    val shardMax = out.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val shardMin = out.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    (0L until 7L).foreach(s => assert(shardMax(s) <= shardMin(s + 1)))
    // deterministic rerun; a different salt yields a different permutation
    val again = Sampling.shuffleShards(d, 8).as[(Long, Long, Double)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    val other = Sampling.shuffleShards(d, 8, salt = "epoch-2")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    val moved = out.count(r => other(r._1) != r._2)
    assert(moved > 3000, s"re-salting must redraw shards (moved $moved)")
  }

  test("empty corpus: every assembly op returns empty with schema, no NPE") {
    val empty = docs().limit(0)
    val fr = Seq(("s", 0.5)).toDF("source", "fraction")
    val w = Seq(("s", 1.0)).toDF("source", "weight")
    assert(Sampling.stratifiedSample(empty, fr).count() === 0)
    assert(Sampling.corpusMix(empty, w).count() === 0)
    assert(Sampling.packSequences(empty).count() === 0)
    assert(Sampling.packSequences(empty).columns.toSeq ===
      Seq("doc_id", "n_tokens", "cum_tokens", "pack_id", "pack_offset"))
    assert(Sampling.leakageSafeSplit(empty).count() === 0)
  }

  test("packSequences: two-phase scan is bucket-count invariant") {
    val d = docs((0L until 100L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "), "s")): _*)
    val a = Sampling.packSequences(d, budget = 17, nBuckets = 3)
      .orderBy($"doc_id").collect().toSeq
    val b = Sampling.packSequences(d, budget = 17, nBuckets = 1024)
      .orderBy($"doc_id").collect().toSeq
    assert(a === b)
    // global invariant: cum_tokens is the running sum of n_tokens
    val rows = Sampling.packSequences(d, budget = 17, nBuckets = 3)
      .orderBy($"doc_id").select($"n_tokens", $"cum_tokens")
      .as[(Long, Long)].collect()
    assert(rows.map(_._1).scanLeft(0L)(_ + _).drop(1).toSeq === rows.map(_._2).toSeq)
  }
}
