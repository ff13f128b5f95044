package graft

import org.apache.spark.sql.DataFrame
import graft.pipeline.{Blocking, GreedyClustering, Tokenize, Canonicalize}
import graft.ops.{TextDedup, Curation, Similarity}

/** The 100-TB-SAFE configuration in one place.
  *
  * Every scale valve this library exposes — the blocking stop-key cap, the
  * LSH hot-bucket caps, the giant-component bound — defaults to EXACT
  * (reference) semantics in the individual operators so the oracled
  * queries stay bit-faithful. This object is the production entry point
  * that turns them all ON with the measured defaults, so a user gets the
  * plan that survives adversarial data (hub tokens, boilerplate buckets,
  * nickname-glued giant components) without reading four files.
  *
  * Each valve's semantic cost is bounded, not hand-waved:
  *  - `maxBlockDf` (Blocking.scala): a skipped token carries <= cap * (1/df)
  *    of a mention's score mass but O(df^2) pairs; at the cap below a
  *    single hub token can contribute at most ~10^8 pairs to one block —
  *    a bounded task — while on healthy name corpora no token reaches it
  *    (valve is a no-op, asserted in PresetsSpec).
  *  - `maxLshBucket` (TextDedup.scala): a bucket of m docs is m(m-1)/2
  *    pairs; members of over-cap buckets are near-identical boilerplate
  *    already handled by exact dedup upstream.
  *  - `annMaxBucket` (Similarity.scala): bounds the per-bucket quadratic
  *    verify at cap^2; with auto planes the expected bucket is ~16, so
  *    only pathological sign buckets are touched.
  *  - `maxComponentSize` (GreedyClustering.scala): components above it use
  *    the 3-phase strong-core path — fidelity to the exact BFS is
  *    machine-checked every round (q_fidelity_greedy, fidelity_diff).
  */
object Presets {

  /** Blocking stop-key valve: tokens with df above this are excluded from
    * pair generation (score-mass-bounded, see Blocking.scala). */
  val maxBlockDf: Long = 10000L

  /** MinHash-LSH hot-bucket cap for document dedup. */
  val maxLshBucket: Int = 1000

  /** Random-hyperplane LSH hot-bucket cap (also the operator default). */
  val annMaxBucket: Int = Similarity.defaultMaxBucket.get

  /** Giant-component bound for the greedy clusterer (operator default —
    * restated here so the preset is self-contained). */
  val maxComponentSize: Int = 3000

  /** Valve-on blocking configuration (reference thresholds, capped df). */
  val blocking: Blocking.Config = Blocking.Config(maxBlockDf = Some(maxBlockDf))

  /** End-to-end ER clustering with every valve on: mentions -> tokens ->
    * capped blocking -> bounded greedy clustering. `durableDir` persists
    * loop state to parquet for long-lived clusters (recommended in
    * production; None uses executor-local checkpoints). */
  def clusterMentions(mentions: DataFrame,
      durableDir: Option[String] = None): DataFrame = {
    val tokens = Tokenize.tokens(mentions)
    GreedyClustering.assignments(mentions, tokens,
      Blocking.candidates(tokens, blocking),
      maxComponentSize = maxComponentSize, durableDir = durableDir)
  }

  /** Raw transcripts -> mention table (marker-free extraction works on
    * unmarked text; see Canonicalize.mentionEventsAuto for that path). */
  def mentionsOf(transcripts: DataFrame): DataFrame =
    Canonicalize.mentions(transcripts)

  /** Full curation verdict with the capped LSH chain: one (doc_id, keep,
    * reason) row per document. */
  def curateDocuments(documents: DataFrame, benchmark: DataFrame): DataFrame = {
    // eager checkpoints: keepSet's contract is that injected stages are
    // ALREADY materialized (the Queries memoizer does the same) — lazy
    // frames here would re-derive the whole shingle->minhash chain per
    // downstream signal
    val shingles = TextDedup.shingles(documents).localCheckpoint()
    val sigs = TextDedup.minhashSignatures(documents, shinglesDf = Some(shingles))
      .localCheckpoint()
    val pairs = TextDedup.lshPairs(documents,
      maxBucket = Some(maxLshBucket), sigsDf = Some(sigs)).localCheckpoint()
    Curation.keepSet(documents, benchmark,
      pairsDf = Some(pairs), shinglesDf = Some(shingles))
  }

  /** Production ANN top-k: KMeans-trained IVF cells at nlist ~ sqrt(n)
    * with the RECALL-HOLDING probe rule nprobe = ceil(nlist/2)
    * ([[Similarity.autoNprobe]] — holds the probed fraction of the
    * calibrated nlist=16/nprobe=8 operating point as the corpus grows, the
    * IVF twin of autoTables holding LSH recall); measured per round in
    * BENCH.md next to the auto-scaled LSH index ([[Similarity.annTopK]]),
    * which remains the right shape for streaming/dedup-flavoured
    * workloads. */
  def annTopK(embeddings: DataFrame, k: Int = 5): DataFrame =
    Similarity.ivfTopKTrained(embeddings, k)
}
