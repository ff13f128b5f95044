package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._

/** Stage 5b — greedy consistency clustering refining the candidate graph
  * (the reference's production clusterer, MessagePassing.java:150-205),
  * run per connected component via typed cogroup.
  *
  * Two-level parallel design:
  *  - components of the (weak) candidate graph up to `maxComponentSize`
  *    run the EXACT reference BFS per component (embarrassingly parallel
  *    across components);
  *  - oversized components (glued by rare-shared-token hubs, e.g.
  *    nicknames — SURVEY.md §7.5) are re-partitioned by their STRONG-edge
  *    (2-common-token) sub-components, each clustered with the exact
  *    engine in parallel; the remaining weak-edge-only refs (nickname /
  *    initial forms) are then attached in a fully parallel join-based
  *    pass: each loner is tested with the same consistency engine against
  *    the serialized final profiles of its weak-adjacent core clusters in
  *    deterministic priority order. Attachment does not mutate profiles
  *    (no cross-loner chaining inside giant components) — the documented
  *    deviation that makes the giant path shuffle-parallel at any scale;
  *    small components keep bit-exact reference semantics.
  */
object GreedyClustering {

  final case class TokRow(mention_id: Long, token: String, pos: Int,
      is_abbr: Boolean, is_before_dot: Boolean, name_part: String)
  final case class MentionRow(mention_id: Long, name: String, weight: Long,
      component_id: Long, toks: Seq[TokRow])
  final case class EdgeRow(component_id: Long, src: Long, dst: Long, common_cnt: Int)
  final case class AssignRow(mention_id: Long, cluster_id: Long)
  final case class EntryRow(token: String, is_abbr: Boolean,
      is_before_dot: Boolean, name_part: Int, ord: Int)
  final case class CoreOut(mention_id: Long, cluster_id: Long,
      profile: Seq[EntryRow])
  final case class LonerWork(loner: MentionRow,
      cands: Seq[(Long, Seq[EntryRow], (Int, Int, Long, Long))])

  private def toToks(m: MentionRow): Array[Tok] =
    m.toks.sortBy(_.pos).map(t => new Tok(t.token, t.pos, t.is_abbr,
      t.is_before_dot, NamePart.fromString(t.name_part))).toArray

  private def toEntryRows(p: ClusterProfile): Seq[EntryRow] =
    p.entries.map(e => EntryRow(e.element.value, e.isAbbr, e.isBeforeDot,
      e.namePart, e.order)).toSeq

  private def fromEntryRows(rows: Seq[EntryRow]): ClusterProfile =
    new ClusterProfile(scala.collection.mutable.ArrayBuffer.from(
      rows.sortBy(_.ord).map(r => new ProfileEntry(
        ElementKey(1, 'T', r.token), r.is_abbr, r.is_before_dot,
        r.name_part, r.ord))))

  private def hierOf(name: String): Hierarchy =
    if (name == "metaphone") Hierarchy.metaphone else Hierarchy.default

  /** assignments(mention_id, name, weight, component_id, cluster_id):
    * cluster_id = BFS-seed mention of the consistency clusterer. */
  def assignments(
      mentions: DataFrame,
      tokens: DataFrame,
      candidates: DataFrame,
      hierarchy: String = "soundex",
      maxComponentSize: Int = 3000): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._

    val m = mentions.localCheckpoint()
    val cand = candidates.localCheckpoint()

    val cc = ConnectedComponents.assignments(m, cand)
      .select($"mention_id", $"name", $"weight", $"component_id")
      .localCheckpoint()

    val mentionToks: Dataset[MentionRow] = tokens
      .groupBy($"mention_id")
      .agg(sort_array(collect_list(struct(
        $"mention_id", $"token", $"pos", $"is_abbr", $"is_before_dot", $"name_part"
      ))).as("toks"))
      .join(cc, "mention_id")
      .select($"mention_id", $"name", $"weight", $"component_id", $"toks")
      .as[MentionRow]
      .localCheckpoint()

    val compOf = cc.select($"mention_id".as("src"), $"component_id")
    val edges: Dataset[EdgeRow] = cand
      .groupBy(least($"dst_id", $"org_id").as("src"),
        greatest($"dst_id", $"org_id").as("dst"))
      .agg(max($"common_cnt").cast("int").as("common_cnt"))
      .join(compOf, "src")
      .select($"component_id", $"src", $"dst", $"common_cnt")
      .as[EdgeRow]
      .localCheckpoint()

    val bigComps = cc.groupBy($"component_id").count()
      .filter($"count" > maxComponentSize)
      .select($"component_id").localCheckpoint()

    val hier = hierarchy

    // ---- exact reference path for normally-sized components
    val smallMentions = mentionToks.join(bigComps, Seq("component_id"), "left_anti")
      .as[MentionRow]
    val smallEdges = edges.join(bigComps, Seq("component_id"), "left_anti")
      .as[EdgeRow]
    val smallAssigns: Dataset[AssignRow] = smallMentions
      .groupByKey(_.component_id)
      .cogroup(smallEdges.groupByKey(_.component_id)) { (_, ms, es) =>
        val refs = ms.map(r => Greedy.Ref(r.mention_id, r.name, r.weight, toToks(r))).toSeq
        Greedy.cluster(refs, es.map(e => (e.src, e.dst)).toSeq, hierOf(hier))
          .iterator.map { case (id, c) => AssignRow(id, c) }
      }

    // ---- distributed giant-component path
    val bigMentions = mentionToks.join(bigComps, Seq("component_id")).as[MentionRow]
      .localCheckpoint()
    val bigEdges = edges.join(bigComps, Seq("component_id")).as[EdgeRow]
      .localCheckpoint()

    // strong-edge sub-components, clustered exactly, profiles exported
    val strong = bigEdges.filter(_.common_cnt >= 2)
    val coreCompDf = ConnectedComponents.run(strong.toDF()
      .select($"src", $"dst"))
      .withColumnRenamed("id", "mention_id")
      .withColumnRenamed("component", "core_comp")
    val bigWithCore = bigMentions.toDF()
      .join(coreCompDf, Seq("mention_id"), "left")
      .withColumn("core_comp", coalesce($"core_comp", $"mention_id"))
    val strongByCore = strong.toDF()
      .join(coreCompDf.withColumnRenamed("mention_id", "src"), "src")
      .select($"core_comp", $"src", $"dst", $"common_cnt")

    val coreOut: Dataset[CoreOut] = bigWithCore
      .select($"mention_id", $"name", $"weight", $"core_comp".as("component_id"), $"toks")
      .as[MentionRow]
      .groupByKey(_.component_id)
      .cogroup(strongByCore
        .select($"core_comp".as("component_id"), $"src", $"dst",
          $"common_cnt".cast("int").as("common_cnt"))
        .as[EdgeRow].groupByKey(_.component_id)) { (_, ms, es) =>
        val refs = ms.map(r => Greedy.Ref(r.mention_id, r.name, r.weight, toToks(r))).toSeq
        val (assign, profiles, _) =
          Greedy.clusterCore(refs, es.map(e => (e.src, e.dst)).toSeq, hierOf(hier))
        assign.iterator.map { case (id, c) =>
          CoreOut(id, c, if (id == c) toEntryRows(profiles(c)) else Seq.empty)
        }
      }
    val coreOutDf = coreOut.toDF().localCheckpoint()

    val clusterSizes = coreOutDf.groupBy($"cluster_id").count()
    val profiles = coreOutDf.filter($"mention_id" === $"cluster_id")
      .select($"cluster_id", $"profile")

    // loners: singleton core clusters; candidates: weak-adjacent clusters
    val loners = coreOutDf.join(clusterSizes.filter($"count" === 1), "cluster_id")
      .select($"mention_id")
    val weakAdj = bigEdges.toDF()
      .select(explode(array(
        struct($"src".as("a"), $"dst".as("b")),
        struct($"dst".as("a"), $"src".as("b")))).as("e"))
      .select($"e.a".as("loner_id"), $"e.b".as("nbr"))
      .join(loners.withColumnRenamed("mention_id", "loner_id"), "loner_id")
      .join(coreOutDf.select($"mention_id".as("nbr"), $"cluster_id"), "nbr")
      .filter($"cluster_id" =!= $"loner_id")
    // neighbor priority for deterministic attachment order
    val nbrPrio = bigMentions.toDF().select($"mention_id".as("nbr"),
      size($"toks").as("p1"),
      expr("size(filter(toks, t -> t.is_abbr))").as("p2"),
      (-$"weight").as("p3"), $"mention_id".as("p4"))
    val lonerCands = weakAdj.join(nbrPrio, "nbr")
      .groupBy($"loner_id", $"cluster_id")
      .agg(min(struct($"p1", $"p2", $"p3", $"p4")).as("prio"))
      .join(profiles, "cluster_id")
      .select($"loner_id", $"cluster_id", $"prio", $"profile")

    val lonerAssigns: Dataset[AssignRow] = bigMentions
      .joinWith(lonerCands, bigMentions("mention_id") === lonerCands("loner_id"))
      .groupByKey(_._1.mention_id)
      .mapGroups { (_, it) =>
        val rows = it.toSeq
        val m0 = rows.head._1
        val h = hierOf(hier)
        val toks = toToks(m0).toSeq
        val ordered = rows.map(_._2)
          .sortBy(r => (r.getStruct(2).getInt(0), r.getStruct(2).getInt(1),
            r.getStruct(2).getLong(2), r.getStruct(2).getLong(3)))
        val chosen = ordered.iterator.map { r =>
          val prof = fromEntryRows(r.getSeq[org.apache.spark.sql.Row](3)
            .map(x => EntryRow(x.getString(0), x.getBoolean(1), x.getBoolean(2),
              x.getInt(3), x.getInt(4))))
          val res = prof.matchRef(h, toks)
          if (res.isConsistent || res.canBecomeConsistent) Some(r.getLong(1))
          else None
        }.collectFirst { case Some(c) => c }
        AssignRow(m0.mention_id, chosen.getOrElse(m0.mention_id))
      }

    val attachedIds = lonerAssigns.toDF().select($"mention_id").localCheckpoint()
    val bigAssigns = coreOutDf
      .join(attachedIds, Seq("mention_id"), "left_anti")
      .select($"mention_id", $"cluster_id").as[AssignRow]
      .union(lonerAssigns)

    val all = smallAssigns.toDF().unionByName(bigAssigns.toDF())
    cc.join(all, "mention_id")
      .select($"mention_id", $"name", $"weight", $"component_id", $"cluster_id")
  }
}
