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
  */
object Greedy {

  final case class Ref(id: Long, name: String, weight: Long, toks: Array[Tok])

  /** Returns (mention_id, cluster_id = BFS-seed mention id). Every ref in
    * `refs` gets exactly one row; refs without surviving candidate edges
    * keep their singleton cluster (hasInOutE filter,
    * MessagePassing.java:161). */
  def cluster(refs: Seq[Ref], edges: Seq[(Long, Long)], h: Hierarchy): Seq[(Long, Long)] = {
    val byId = refs.map(r => r.id -> r).toMap
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    for ((a, b) <- edges if a != b && byId.contains(a) && byId.contains(b)) {
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }

    def priority(r: Ref): (Int, Int, Long, Long) =
      (r.toks.length, r.toks.count(_.isAbbr), -r.weight, r.id)

    val sorted = refs.filter(r => adj.contains(r.id)).sortBy(priority)
    val prioOf = sorted.iterator.zipWithIndex.map { case (r, i) => r.id -> i }.toMap
    // dedup + deterministic neighbor order
    val adjSorted: Map[Long, IndexedSeq[Long]] = adj.iterator.map { case (id, ns) =>
      id -> ns.distinct.sortBy(prioOf).toIndexedSeq
    }.toMap

    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    val visited = mutable.HashSet.empty[Long]

    for (seed <- sorted if !visited.contains(seed.id)) {
      visited += seed.id
      out += seed.id -> seed.id
      val profile = ClusterProfile.fromToks(seed.toks.toSeq)
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
            profile.merge(result)
            queue += cand
          }
        }
      }
    }
    // singletons (no candidate edges): own cluster
    for (r <- refs if !adj.contains(r.id)) out += r.id -> r.id
    out.toSeq
  }
}
