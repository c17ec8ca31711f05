package graft.ops

import org.apache.spark.rdd.RDD

/** Distributed k-core decomposition by iterative peeling: repeatedly
  * delete nodes with degree < k until the fixpoint. Like
  * [[ConnectedComponents]], every structure stays a keyed RDD with
  * per-round materialization (a DataFrame loop re-plans a growing
  * lineage — the round-7 iterative-graph lesson), shuffles are
  * reduceByKey/join on node ids, and nothing reaches the driver but
  * the per-round edge count.
  */
object KCore {

  /** (node, degree-within-core) for the k-core of `edges0`, peeled
    * for exactly `rounds` rounds and then CHECKED to be a fixpoint —
    * the round budget is mirrored by the oracle's unrolled CTE chain,
    * so a corpus needing deeper peeling fails loud on both sides
    * instead of silently disagreeing. Input edges are unordered
    * distinct pairs (no self-loops). */
  def coreDegrees(edges0: RDD[(Long, Long)], k: Int, rounds: Int = 8)
      : RDD[(Long, Long)] = {
    var e: RDD[(Long, Long)] = edges0
      .flatMap(p => Iterator(p, p.swap))
      .persist()
    e.count()
    (1 to rounds).foreach { _ =>
      val keep = e.mapValues(_ => 1L).reduceByKey(_ + _)
        .filter(_._2 >= k)
      val e2 = e.join(keep).map { case (u, (v, _)) => (v, u) }
        .join(keep).map { case (v, (u, _)) => (u, v) }
        .persist()
      e2.count()
      e.unpersist(blocking = false)
      e = e2
    }
    val deg = e.mapValues(_ => 1L).reduceByKey(_ + _)
    require(deg.filter(_._2 < k).isEmpty(),
      s"$k-core not converged within $rounds peeling rounds — raise the " +
        "round budget AND the oracle's unrolled CTE depth together")
    deg
  }
}
