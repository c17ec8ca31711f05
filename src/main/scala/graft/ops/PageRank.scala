package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

/** Fixed-round PageRank (Page et al., "The PageRank citation
  * ranking", 1999; damping 0.85) over an undirected edge list —
  * centrality for near-dup graphs: template hubs and cluster
  * exemplars surface as high-rank nodes.
  *
  * Same execution stance as [[ConnectedComponents]] /
  * [[LabelPropagation]]: a distributed RDD loop on a fixed
  * HashPartitioner, per-round state one (node, rank) pair per node,
  * each round materialized and its parent unpersisted so the lineage
  * never grows with the round count. The edge+degree join is built
  * ONCE and persisted — per round only the rank join and one
  * reduceByKey shuffle run. */
object PageRank {

  /** (node, rank) after `rounds` power iterations at damping `d`.
    * Input may contain duplicates and either orientation; both
    * directions propagate (undirected). Isolated nodes do not
    * appear. */
  def ranks(edges0: RDD[(Long, Long)], rounds: Int,
      d: Double = 0.85): RDD[(Long, Double)] = {
    require(rounds >= 1, s"pagerank needs >= 1 round, got $rounds")
    val numParts = math.max(edges0.getNumPartitions, 1)
    val part = new HashPartitioner(numParts)

    // distinct: input carrying both orientations (or duplicates) of
    // an edge would otherwise double that edge's degree share and
    // skew the mass it forwards
    val sym = edges0.filter(p => p._1 != p._2)
      .flatMap(p => Iterator(p, p.swap))
      .distinct(numParts)

    // (src, (dst, outDegree)) — the per-round join side, built once
    val deg = sym.mapValues(_ => 1L).reduceByKey(part, _ + _)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val withDeg = sym.join(deg, part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val n = deg.count()
    var pr: RDD[(Long, Double)] = deg.mapValues(_ => 1.0 / n)
      .persist(StorageLevel.MEMORY_AND_DISK)

    for (_ <- 1 to rounds) {
      val next = withDeg.join(pr, part)
        .map { case (_, ((dst, dg), p)) => (dst, p / dg) }
        .reduceByKey(part, _ + _)
        .mapValues(c => (1.0 - d) / n + d * c)
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the parent
      pr.unpersist(blocking = false)
      pr = next
    }
    pr
  }
}
