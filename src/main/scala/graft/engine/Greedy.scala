package graft.engine

import scala.collection.mutable

/** The greedy consistency clusterer (MessagePassing.clusterCandidates,
  * logic/MessagePassing.java:150-205), confined to one connected component
  * — clustering never crosses REF_REF components, so running it
  * per-component inside `flatMapGroups` is semantically identical to the
  * reference's whole-graph pass and embarrassingly parallel across
  * components.
  *
  * Order: the reference shuffles randomly then sorts by (token count asc,
  * abbreviated-token count asc, weight desc) — the shuffle only perturbs
  * ties and its own experiment measures F1 std ~2.7e-4 over 30 runs
  * (MainSortSensitivity.java). We replace the random tie-break with the
  * mention id for reproducibility, and use the same total order for BFS
  * neighbor visits (the reference iterates a HashSet there).
  *
  * Giant components (SURVEY.md §7.5): rare shared tokens (e.g. nicknames)
  * pass the relative blocking threshold and form cross-family hubs that
  * glue most refs into one component; plain BFS there is
  * O(edges x cluster-profile) and intractable. [[clusterGiant]] applies
  * the reference's own remedy — the stricter 2-common-token edge
  * condition — to cluster family cores, then attaches the remaining
  * weak-edge-only refs (nickname/initial forms) to adjacent core clusters
  * in one bounded priority-ordered pass through the same consistency
  * engine. Small components always use the exact reference BFS.
  */
object Greedy {

  final case class Ref(id: Long, name: String, weight: Long, toks: Array[Tok])
  final case class Edge(a: Long, b: Long, commonCnt: Int)

  private type Prio = (Int, Int, Long, Long)
  private def priority(r: Ref): Prio =
    (r.toks.length, r.toks.count(_.isAbbr), -r.weight, r.id)

  /** Exact reference greedy BFS. Returns (mention_id, cluster_id = seed). */
  def cluster(refs: Seq[Ref], edges: Seq[(Long, Long)], h: Hierarchy): Seq[(Long, Long)] =
    clusterCore(refs, edges, h)._1

  /** Core BFS that also returns each cluster's final profile (used by the
    * giant-component attachment pass). */
  def clusterCore(refs: Seq[Ref], edges: Seq[(Long, Long)], h: Hierarchy)
      : (Seq[(Long, Long)], mutable.HashMap[Long, ClusterProfile], mutable.HashMap[Long, Long]) = {
    val byId = refs.map(r => r.id -> r).toMap
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    for ((a, b) <- edges if a != b && byId.contains(a) && byId.contains(b)) {
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }

    val sorted = refs.filter(r => adj.contains(r.id)).sortBy(priority)
    val prioOf = sorted.iterator.zipWithIndex.map { case (r, i) => r.id -> i }.toMap
    val adjSorted: Map[Long, IndexedSeq[Long]] = adj.iterator.map { case (id, ns) =>
      id -> ns.distinct.sortBy(prioOf).toIndexedSeq
    }.toMap

    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    val assign = mutable.HashMap.empty[Long, Long]
    val profiles = mutable.HashMap.empty[Long, ClusterProfile]
    val visited = mutable.HashSet.empty[Long]

    for (seed <- sorted if !visited.contains(seed.id)) {
      visited += seed.id
      out += seed.id -> seed.id
      assign(seed.id) = seed.id
      val profile = ClusterProfile.fromToks(seed.toks.toSeq)
      profiles(seed.id) = profile
      val queue = mutable.Queue(seed)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        for (adjId <- adjSorted.getOrElse(u.id, IndexedSeq.empty) if !visited.contains(adjId)) {
          val cand = byId(adjId)
          val result = profile.matchRef(h, cand.toks.toSeq)
          val consistent = result.isConsistent || result.canBecomeConsistent
          if (consistent) {
            visited += adjId
            out += adjId -> seed.id
            assign(adjId) = seed.id
            profile.merge(result)
            queue += cand
          }
        }
      }
    }
    // singletons (no candidate edges): own cluster
    for (r <- refs if !adj.contains(r.id)) {
      out += r.id -> r.id
      assign(r.id) = r.id
      profiles.getOrElseUpdate(r.id, ClusterProfile.fromToks(r.toks.toSeq))
    }
    (out.toSeq, profiles, assign)
  }

  /** Giant-component path: strong-edge (common >= 2) core clustering, then
    * one attachment pass over weak edges for refs left in singleton
    * clusters. */
  def clusterGiant(refs: Seq[Ref], edges: Seq[Edge], h: Hierarchy): Seq[(Long, Long)] = {
    val strong = edges.collect { case e if e.commonCnt >= 2 => (e.a, e.b) }
    val (_, profiles, assign) = clusterCore(refs, strong, h)

    val clusterSize = mutable.HashMap.empty[Long, Int].withDefaultValue(0)
    assign.valuesIterator.foreach(c => clusterSize(c) += 1)

    val byId = refs.map(r => r.id -> r).toMap
    val prioOf = refs.sortBy(priority).iterator.zipWithIndex
      .map { case (r, i) => r.id -> i }.toMap
    val allAdj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    for (e <- edges if e.a != e.b && byId.contains(e.a) && byId.contains(e.b)) {
      allAdj.getOrElseUpdate(e.a, mutable.ArrayBuffer.empty) += e.b
      allAdj.getOrElseUpdate(e.b, mutable.ArrayBuffer.empty) += e.a
    }

    val loners = refs
      .filter(r => clusterSize(assign(r.id)) == 1 && allAdj.contains(r.id))
      .sortBy(priority)
    for (r <- loners if clusterSize(assign(r.id)) == 1) {
      val neighbors = allAdj(r.id).distinct.sortBy(prioOf)
      var attached = false
      var i = 0
      while (!attached && i < neighbors.length) {
        val c = assign(neighbors(i))
        if (c != r.id) {
          val profile = profiles(c)
          val result = profile.matchRef(h, r.toks.toSeq)
          if (result.isConsistent || result.canBecomeConsistent) {
            clusterSize(assign(r.id)) -= 1
            assign(r.id) = c
            clusterSize(c) += 1
            profile.merge(result)
            attached = true
          }
        }
        i += 1
      }
    }
    refs.map(r => r.id -> assign(r.id))
  }
}
