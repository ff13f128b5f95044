package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine._
import scala.collection.mutable

/** Temporary diagnostic: replay the greedy engine over one component from a
  * Verify dump with full decision tracing.
  * usage: runMain graft.DebugGreedy /tmp/verify_m3 <cluster_id>
  */
object DebugGreedy {
  def main(args: Array[String]): Unit = {
    val dump = args(0); val clusterId = args(1).toLong
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val assigns = spark.read.parquet(s"$dump/q_greedy_assignments")
    val comp = assigns.filter($"cluster_id" === clusterId)
      .select($"component_id").distinct().as[Long].collect().head
    val memberIds = assigns.filter($"component_id" === comp)
      .select($"mention_id").as[Long].collect().toSet
    println(s"component $comp: ${memberIds.size} members")

    val toks = spark.read.parquet(s"$dump/q_tokens")
      .filter($"mention_id".isin(memberIds.toSeq: _*))
      .collect().groupBy(_.getAs[Long]("mention_id"))
    val weights = spark.read.parquet(s"$dump/q_mentions")
      .filter($"mention_id".isin(memberIds.toSeq: _*))
      .collect().map(r => r.getAs[Long]("mention_id") -> (r.getAs[String]("name"), r.getAs[Long]("weight"))).toMap
    val cands = spark.read.parquet(s"$dump/q_candidates")
      .filter($"dst_id".isin(memberIds.toSeq: _*) && $"org_id".isin(memberIds.toSeq: _*))
      .select($"dst_id", $"org_id").as[(Long, Long)].collect()

    val refs = memberIds.toSeq.sorted.map { id =>
      val (name, w) = weights(id)
      val t = toks(id).sortBy(_.getAs[Int]("pos")).map { r =>
        new Tok(r.getAs[String]("token"), r.getAs[Int]("pos"), r.getAs[Boolean]("is_abbr"),
          r.getAs[Boolean]("is_before_dot"), NamePart.fromString(r.getAs[String]("name_part")))
      }
      Greedy.Ref(id, name, w, t)
    }

    // re-run with tracing (mirror of Greedy.cluster)
    val h = Hierarchy.default
    val byId = refs.map(r => r.id -> r).toMap
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    for ((a, b) <- cands.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct if a != b) {
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }
    def priority(r: Greedy.Ref) = (r.toks.length, r.toks.count(_.isAbbr), -r.weight, r.id)
    val sorted = refs.filter(r => adj.contains(r.id)).sortBy(priority)
    val prioOf = sorted.iterator.zipWithIndex.map { case (r, i) => r.id -> i }.toMap
    val adjS = adj.iterator.map { case (id, ns) => id -> ns.distinct.sortBy(prioOf).toIndexedSeq }.toMap
    val visited = mutable.HashSet.empty[Long]
    for (seed <- sorted if !visited.contains(seed.id)) {
      visited += seed.id
      val interesting = seed.id == clusterId
      if (interesting) println(s"== seed ${seed.name} (${seed.id})")
      val profile = ClusterProfile.fromToks(seed.toks.toSeq)
      val queue = mutable.Queue(seed)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        for (adjId <- adjS.getOrElse(u.id, IndexedSeq.empty) if !visited.contains(adjId)) {
          val cand = byId(adjId)
          val result = profile.matchRef(h, cand.toks.toSeq)
          val c1 = result.isConsistent
          val c2 = !c1 && result.canBecomeConsistent
          if (interesting)
            println(f"  from=${u.name}%-28s test=${cand.name}%-28s cons=$c1 repair=$c2 " +
              s"profile=[${profile.entries.map(e => s"${e.element.value}:${e.namePart}").mkString(",")}] " +
              s"candParts=[${cand.toks.map(_.namePart).mkString(",")}]")
          if (c1 || c2) {
            visited += adjId
            profile.merge(result)
            queue += cand
          }
        }
      }
    }
    spark.stop()
  }
}
