package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 parity for the clustering-stage rewrites: the seeded-init /
  * carried-changed-flag CC loop and the injectable precomputed-CC path of
  * the greedy clusterer must be value-identical to the round-5 forms. */
class CcGreedyParitySpec extends SparkSpec {
  import spark.implicits._

  test("CC seeded init: chains, stars, pairs and multi-component graphs label by min id") {
    // odd chain, even chain, star, pair — mixed in one edge set so the
    // seeded first hop + pointer jumping is exercised across shapes
    val edges =
      (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq ++ // chain 1-6
        Seq((10L, 11L), (10L, 12L), (10L, 13L)) ++          // star at 10
        Seq((20L, 21L)) ++                                  // pair
        Seq((31L, 30L), (32L, 31L), (33L, 32L), (34L, 33L)) // reversed chain
    val out = ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    (1L to 6L).foreach(i => assert(out(i) === 1L))
    Seq(10L, 11L, 12L, 13L).foreach(i => assert(out(i) === 10L))
    Seq(20L, 21L).foreach(i => assert(out(i) === 20L))
    (30L to 34L).foreach(i => assert(out(i) === 30L))
    // empty edge set converges immediately to an empty labeling
    assert(ConnectedComponents.run(Seq.empty[(Long, Long)].toDF("src", "dst"))
      .count() === 0L)
  }

  test("greedy with injected precomputed CC == greedy recomputing CC internally") {
    val sfDir = "/root/testdata/sf0.001"
    val m = Canonicalize.mentions(graft.synth.Synth.transcripts(spark, sfDir))
      .localCheckpoint()
    val t = Tokenize.tokens(m).localCheckpoint()
    val cand = Blocking.candidates(t).localCheckpoint()
    val cc = ConnectedComponents.assignments(m, cand).localCheckpoint()
    val internal = GreedyClustering.assignments(m, t, cand)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val injected = GreedyClustering.assignments(m, t, cand, ccDf = Some(cc))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(injected === internal)
  }
}
