package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table
  * (vec_id, embedding float[], label).
  *
  * Brute-force cosine top-k is the correctness baseline (quadratic —
  * fine at verification scale, explicitly NOT the scale path). The
  * random-hyperplane LSH variant is the scale path: signatures are a
  * linear scan, the quadratic join is confined to hash buckets. Both use
  * only codegen'd higher-order functions (zip_with/aggregate) — no UDFs.
  */
object Similarity {

  private def dot(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)")

  private def norm(c: String) =
    expr(s"sqrt(aggregate(transform($c, x -> cast(x as double) * cast(x as double)), 0D, (acc, v) -> acc + v))")

  /** Brute-force cosine top-k: (vec_id, neighbor_id, cosine, rank). */
  def knnBrute(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm("embedding"))
    val a = e.select(col("vec_id"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    a.crossJoin(b)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot("ea", "eb") / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic random-hyperplane weights per hash table:
    * (table t, plane p, dim d) -> ±1 from md5 parity — reproducible in
    * the oracle. */
  private def planeWeights(embeddings: DataFrame, tables: Int, planes: Int,
      dims: Int): DataFrame = {
    val s = embeddings.sparkSession
    s.range(tables).toDF("t")
      .crossJoin(s.range(planes).toDF("p"))
      .crossJoin(s.range(dims).toDF("d"))
      .withColumn("wgt",
        when(conv(substring(md5(concat_ws(":", col("t"), col("p"), col("d"))), 1, 8), 16, 10)
          .cast("long") % 2 === 0, 1.0).otherwise(-1.0))
  }

  /** Multi-table LSH signatures: (vec_id, t, sig) — one sign-pattern
    * bucket per hash table; more tables = higher recall, standard
    * random-hyperplane LSH. */
  def lshSignatures(embeddings: DataFrame, tables: Int = 12, planes: Int = 5): DataFrame = {
    val dims = embeddings.selectExpr("size(embedding) d").limit(1)
      .collect()(0).getInt(0)
    val exploded = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .withColumn("v", col("v").cast("double"))
    exploded
      .join(planeWeights(embeddings, tables, planes, dims), "d")
      .groupBy(col("vec_id"), col("t"), col("p"))
      .agg(sum(col("v") * col("wgt")).as("proj"))
      .groupBy(col("vec_id"), col("t"))
      .agg(sum(when(col("proj") > 0, expr("shiftleft(1L, cast(p as int))"))
        .otherwise(0L)).as("sig"))
  }

  /** Drop (t, sig) buckets holding more than `cap` vectors — the
    * hot-bucket valve for sign-pattern LSH (e.g. the all-positive bucket
    * on non-centered data); the other tables still cover its members. */
  private def capBuckets(sigs: DataFrame, cap: Option[Int]): DataFrame =
    Valves.capGroups(sigs, Seq("t", "sig"), cap)

  /** ANN top-k via multi-table LSH buckets: candidate pairs share a bucket
    * in ANY table; quadratic work confined to buckets. */
  def annTopK(embeddings: DataFrame, k: Int = 5, tables: Int = 12, planes: Int = 5,
      maxBucket: Option[Int] = None): DataFrame = {
    val sigs = capBuckets(lshSignatures(embeddings, tables, planes), maxBucket)
    val candPairs = sigs.as("x")
      .join(sigs.as("y"), Seq("t", "sig"))
      .filter(col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("neighbor_id"))
      .distinct()
    val e = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm("embedding"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candPairs
      .join(e.select(col("vec_id"), col("embedding").as("ea"), col("nrm").as("na")), "vec_id")
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"),
        col("nrm").as("nb")), "neighbor_id")
      .withColumn("cosine", round(dot("ea", "eb") / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: (a, b, cosine) with a < b and
    * cosine >= `minCosine`, candidates confined to multi-table LSH buckets
    * (same index as [[annTopK]]) — the dedup-flavoured use of the ANN
    * index: one linear signature scan + bucket-bounded verification, never
    * the all-pairs cross join. */
  def embedNearDups(embeddings: DataFrame, minCosine: Double = 0.3,
      tables: Int = 12, planes: Int = 5, maxBucket: Option[Int] = None): DataFrame = {
    val sigs = capBuckets(lshSignatures(embeddings, tables, planes), maxBucket)
    val cand = sigs.as("x")
      .join(sigs.as("y"), Seq("t", "sig"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
    val e = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm("embedding"))
    cand
      .join(e.select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na")), "a")
      .join(e.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb")), "b")
      .withColumn("cosine", round(dot("ea", "eb") / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("a"), col("b"), col("cosine"))
  }

  /** IVF coarse index, probe assignment as a pure per-row projection.
    *
    * Centroids are the `nlist` lowest-vec_id embeddings — a deterministic,
    * oracle-reproducible stand-in for trained k-means centroids (swap in
    * MLlib KMeans at production; the plan shape is identical). They are
    * fetched with a TakeOrderedAndProject (no global sort) and inlined as
    * a literal array, so cell assignment + probe ranking is ONE
    * shuffle-free codegen'd projection per row — the 100-TB shape: no
    * N x nlist row expansion, no window shuffle.
    *
    * Returns (vec_id, cell, cosine, probe_rank) for probe_rank <= nprobe;
    * probe_rank = 1 is the cell the vector is assigned to. */
  def ivfProbes(embeddings: DataFrame, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = embeddings.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(nlist).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    ivfProbesWith(embeddings, cents, nprobe)
  }

  /** The probe projection over an explicit centroid set — shared by the
    * deterministic (oracled) and the KMeans-trained index. */
  private def ivfProbesWith(embeddings: DataFrame,
      centroids: Seq[(Long, Array[Double])], nprobe: Int): DataFrame = {
    val cents = centroids.map { case (id, v) =>
      val nrm = math.sqrt(v.foldLeft(0d)((acc, x) => acc + x * x))
      val arr = v.map(d => s"${java.lang.Double.toString(d)}D").mkString(", ")
      s"named_struct('cell', ${id}L, 'cnrm', ${java.lang.Double.toString(nrm)}D, 'cv', array($arr))"
    }.mkString("array(", ", ", ")")
    val probes =
      s"""slice(array_sort(transform($cents, c -> named_struct(
         |  'ncos', -round(aggregate(zip_with(embedding, c.cv, (x, y) -> cast(x as double) * y),
         |                           0D, (acc, v) -> acc + v) / (nrm * c.cnrm), 6),
         |  'cell', c.cell))), 1, $nprobe)""".stripMargin
    embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm("embedding"))
      .select(col("vec_id"), posexplode(expr(probes)))
      .select(col("vec_id"), col("col.cell").as("cell"),
        (col("col.ncos") * -1d).as("cosine"), (col("pos") + 1).as("probe_rank"))
  }

  /** IVF probes over KMeans-TRAINED coarse centroids (MLlib, fixed seed)
    * — the production-quality cell partition (balanced cells on clustered
    * corpora), same shuffle-free probe projection as [[ivfProbes]]. Not
    * SQL-oracle-reproducible (iterative training), so it is fixture-tested
    * instead; cell ids are the centroid indices. */
  def ivfProbesTrained(embeddings: DataFrame, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 7L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = embeddings
      .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(feats)
    val cents = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray) }.toSeq
    ivfProbesWith(embeddings, cents, nprobe)
  }

  /** IVF-flat ANN top-k: candidates are vectors whose ASSIGNED cell is
    * among the query's `nprobe` nearest cells; quadratic work confined to
    * cells (shuffle key = cell, per-cell size bounded by the coarse
    * partition). The second scale path next to [[annTopK]] — better
    * recall/cost control on clustered corpora. */
  def ivfTopK(embeddings: DataFrame, k: Int = 5, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val probes = ivfProbes(embeddings, nlist, nprobe)
    val assign = probes.filter(col("probe_rank") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cell"))
    val e = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", norm("embedding"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    // each neighbor has exactly one assigned cell -> the join emits each
    // (vec_id, neighbor_id) at most once; no distinct needed
    probes.select(col("vec_id"), col("cell"))
      .join(assign, "cell")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .join(e.select(col("vec_id"), col("embedding").as("ea"), col("nrm").as("na")), "vec_id")
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"),
        col("nrm").as("nb")), "neighbor_id")
      .withColumn("cosine", round(dot("ea", "eb") / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  // ---------------------------------------------------------------- oracle

  val ctes: String =
    """emb AS (
      |  SELECT vec_id, embedding,
      |         sqrt(list_sum([ (x::DOUBLE) * (x::DOUBLE) FOR x IN embedding ])) AS nrm
      |  FROM embeddings
      |),
      |knn_brute AS (
      |  SELECT vec_id, neighbor_id, cosine, rank::INT AS rank FROM (
      |    SELECT a.vec_id, b.vec_id AS neighbor_id,
      |           round(list_sum([ (a.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE)
      |                            FOR i IN generate_series(1, len(a.embedding)) ])
      |                 / (a.nrm * b.nrm), 6) AS cosine,
      |           row_number() OVER (PARTITION BY a.vec_id
      |                              ORDER BY round(list_sum([ (a.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE)
      |                            FOR i IN generate_series(1, len(a.embedding)) ])
      |                 / (a.nrm * b.nrm), 6) DESC, b.vec_id ASC) AS rank
      |    FROM emb a, emb b WHERE a.vec_id <> b.vec_id
      |  ) WHERE rank <= 5
      |),
      |plane_weights AS (
      |  SELECT t, p, d,
      |         CASE WHEN ('0x' || substr(md5(t::VARCHAR || ':' || p::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT % 2 = 0
      |              THEN 1.0 ELSE -1.0 END AS wgt
      |  FROM (SELECT unnest(generate_series(0, 11)) AS t),
      |       (SELECT unnest(generate_series(0, 4)) AS p),
      |       (SELECT unnest(generate_series(0, 63)) AS d)
      |),
      |lsh_sigs AS (
      |  SELECT vec_id, t,
      |         sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS sig
      |  FROM (
      |    SELECT e.vec_id, w.t, w.p, sum((e.embedding[w.d + 1]::DOUBLE) * w.wgt) AS proj
      |    FROM embeddings e, plane_weights w
      |    GROUP BY 1, 2, 3
      |  ) GROUP BY 1, 2
      |),
      |ann_cand AS (
      |  SELECT DISTINCT x.vec_id AS vec_id, y.vec_id AS neighbor_id
      |  FROM lsh_sigs x JOIN lsh_sigs y ON x.t = y.t AND x.sig = y.sig
      |  WHERE x.vec_id <> y.vec_id
      |),
      |ann_topk AS (
      |  SELECT vec_id, neighbor_id, cosine, rank::INT AS rank FROM (
      |    SELECT c.vec_id, c.neighbor_id,
      |           round(list_sum([ (a.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE)
      |                            FOR i IN generate_series(1, len(a.embedding)) ])
      |                 / (a.nrm * b.nrm), 6) AS cosine,
      |           row_number() OVER (PARTITION BY c.vec_id
      |                              ORDER BY round(list_sum([ (a.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE)
      |                            FOR i IN generate_series(1, len(a.embedding)) ])
      |                 / (a.nrm * b.nrm), 6) DESC, c.neighbor_id ASC) AS rank
      |    FROM ann_cand c
      |    JOIN emb a ON c.vec_id = a.vec_id
      |    JOIN emb b ON c.neighbor_id = b.vec_id
      |  ) WHERE rank <= 5
      |),
      |embed_neardup AS (
      |  SELECT a, b, cosine FROM (
      |    SELECT c.a, c.b,
      |           round(list_sum([ (ea.embedding[i]::DOUBLE) * (eb.embedding[i]::DOUBLE)
      |                            FOR i IN generate_series(1, len(ea.embedding)) ])
      |                 / (ea.nrm * eb.nrm), 6) AS cosine
      |    FROM (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      |          FROM lsh_sigs x JOIN lsh_sigs y ON x.t = y.t AND x.sig = y.sig
      |          WHERE x.vec_id < y.vec_id) c
      |    JOIN emb ea ON c.a = ea.vec_id
      |    JOIN emb eb ON c.b = eb.vec_id
      |  ) WHERE cosine >= 0.3
      |),
      |ivf_centroids AS (
      |  SELECT vec_id AS cell, embedding AS cv, nrm AS cnrm
      |  FROM emb ORDER BY vec_id LIMIT 16
      |),
      |ivf_probes AS (
      |  SELECT vec_id, cell, cosine, probe_rank::INT AS probe_rank FROM (
      |    SELECT e.vec_id, c.cell,
      |           round(list_sum([ (e.embedding[i]::DOUBLE) * (c.cv[i]::DOUBLE)
      |                            FOR i IN generate_series(1, len(e.embedding)) ])
      |                 / (e.nrm * c.cnrm), 6) AS cosine,
      |           row_number() OVER (PARTITION BY e.vec_id
      |                              ORDER BY round(list_sum([ (e.embedding[i]::DOUBLE) * (c.cv[i]::DOUBLE)
      |                            FOR i IN generate_series(1, len(e.embedding)) ])
      |                 / (e.nrm * c.cnrm), 6) DESC, c.cell ASC) AS probe_rank
      |    FROM emb e, ivf_centroids c
      |  ) WHERE probe_rank <= 4
      |),
      |ivf_topk AS (
      |  SELECT vec_id, neighbor_id, cosine, rank::INT AS rank FROM (
      |    SELECT p.vec_id, a.vec_id AS neighbor_id,
      |           round(list_sum([ (ea.embedding[i]::DOUBLE) * (eb.embedding[i]::DOUBLE)
      |                            FOR i IN generate_series(1, len(ea.embedding)) ])
      |                 / (ea.nrm * eb.nrm), 6) AS cosine,
      |           row_number() OVER (PARTITION BY p.vec_id
      |                              ORDER BY round(list_sum([ (ea.embedding[i]::DOUBLE) * (eb.embedding[i]::DOUBLE)
      |                            FOR i IN generate_series(1, len(ea.embedding)) ])
      |                 / (ea.nrm * eb.nrm), 6) DESC, a.vec_id ASC) AS rank
      |    FROM (SELECT vec_id, cell FROM ivf_probes) p
      |    JOIN (SELECT vec_id, cell FROM ivf_probes WHERE probe_rank = 1) a USING (cell)
      |    JOIN emb ea ON p.vec_id = ea.vec_id
      |    JOIN emb eb ON a.vec_id = eb.vec_id
      |    WHERE p.vec_id <> a.vec_id
      |  ) WHERE rank <= 5
      |)""".stripMargin
}
