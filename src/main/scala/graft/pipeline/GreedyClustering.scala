package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._

/** Stage 5b — greedy consistency clustering refining the candidate graph
  * (the reference's production clusterer, MessagePassing.java:150-205),
  * run per connected component via typed cogroup.
  *
  * Spark-first shape: components are computed first (ConnectedComponents);
  * mentions-with-tokens and candidate edges are each keyed by component and
  * cogrouped, so the sequential rule engine only ever sees one (small)
  * component — embarrassingly parallel across components, no driver-side
  * iteration besides the CC loop. Components are bounded by the blocking
  * thresholds; `maxComponentSize` is the skew guard: oversized components
  * (glued by rare-shared-token hubs, e.g. nicknames) take the
  * strong-edge-core + weak-edge-attachment path (Greedy.clusterGiant)
  * instead of stalling a single task on an O(edges x profile) BFS.
  */
object GreedyClustering {

  final case class TokRow(mention_id: Long, token: String, pos: Int,
      is_abbr: Boolean, is_before_dot: Boolean, name_part: String)
  final case class MentionRow(mention_id: Long, name: String, weight: Long,
      component_id: Long, toks: Seq[TokRow])
  final case class EdgeRow(component_id: Long, src: Long, dst: Long, common_cnt: Int)
  final case class AssignRow(mention_id: Long, cluster_id: Long)

  /** assignments(mention_id, name, weight, component_id, cluster_id):
    * cluster_id = BFS-seed mention of the consistency clusterer. */
  def assignments(
      mentions: DataFrame,
      tokens: DataFrame,
      candidates: DataFrame,
      hierarchy: String = "soundex",
      /** Components above this size take the giant-component path
        * (strong-edge cores + weak-edge attachment) instead of plain BFS. */
      maxComponentSize: Int = 3000): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._

    // Materialize the expensive upstream stages once: `candidates` (the
    // blocking self-join) feeds both the CC pre-pass and the edge list,
    // and `mentions` is re-joined three times below. localCheckpoint cuts
    // lineage so no action recomputes the shuffle (in the checkpointed
    // Pipeline these arrive as parquet stages already).
    val m = mentions.localCheckpoint()
    val cand = candidates.localCheckpoint()

    val cc = ConnectedComponents.assignments(m, cand)
      .select($"mention_id", $"name", $"weight", $"component_id")
      .localCheckpoint()

    val mentionToks: Dataset[MentionRow] = tokens.localCheckpoint()
      .groupBy($"mention_id")
      .agg(sort_array(collect_list(struct(
        $"mention_id", $"token", $"pos", $"is_abbr", $"is_before_dot", $"name_part"
      ))).as("toks"))
      .join(cc, "mention_id")
      .select($"mention_id", $"name", $"weight", $"component_id", $"toks")
      .as[MentionRow]

    val compOf = cc.select($"mention_id".as("src"), $"component_id")
    val edges: Dataset[EdgeRow] = cand
      .groupBy(least($"dst_id", $"org_id").as("src"),
        greatest($"dst_id", $"org_id").as("dst"))
      .agg(max($"common_cnt").cast("int").as("common_cnt"))
      .join(compOf, "src")
      .select($"component_id", $"src", $"dst", $"common_cnt")
      .as[EdgeRow]

    val hier = hierarchy // avoid closing over `this`
    val maxSize = maxComponentSize

    val assigns: Dataset[AssignRow] = mentionToks
      .groupByKey(_.component_id)
      .cogroup(edges.groupByKey(_.component_id)) { (_, ms, es) =>
        val refs = ms.map { m =>
          Greedy.Ref(m.mention_id, m.name, m.weight,
            m.toks.sortBy(_.pos).map(t => new Tok(t.token, t.pos, t.is_abbr,
              t.is_before_dot, NamePart.fromString(t.name_part))).toArray)
        }.toSeq
        val h = if (hier == "metaphone") Hierarchy.metaphone else Hierarchy.default
        val edgeSeq = es.toSeq
        if (refs.size > maxSize) {
          // skew guard: strong-edge core clustering + weak-edge attachment
          Greedy.clusterGiant(refs,
            edgeSeq.map(e => Greedy.Edge(e.src, e.dst, e.common_cnt)), h).iterator
            .map { case (id, c) => AssignRow(id, c) }
        } else {
          Greedy.cluster(refs, edgeSeq.map(e => (e.src, e.dst)), h).iterator
            .map { case (id, c) => AssignRow(id, c) }
        }
      }

    cc.join(assigns.toDF(), "mention_id")
      .withColumn("cluster_id",
        when($"cluster_id" === -1L, $"component_id").otherwise($"cluster_id"))
      .select($"mention_id", $"name", $"weight", $"component_id", $"cluster_id")
  }
}
