package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

/** Synchronous label propagation (Raghavan et al., "Near linear time
  * algorithm to detect community structures in large-scale networks",
  * Phys. Rev. E 2007) — the community view between connected
  * components (one bridge edge merges two template families) and
  * triangle counting (structure only, no assignment).
  *
  * Deterministic variant: every node simultaneously adopts its
  * neighbors' PLURALITY label, ties to the smallest label — no random
  * node order, so a fixed round count yields one reproducible
  * labeling on any engine (the DuckDB oracle unrolls the identical
  * rounds). Like [[ConnectedComponents]], everything stays a
  * distributed RDD keyed by node id: per round one join + two
  * reduceByKey shuffles on a fixed HashPartitioner, per-round state
  * is one (node, label) pair per node, and each round's result is
  * materialized and the previous unpersisted — the lineage never
  * grows with the round count (the DataFrame-loop formulation
  * re-plans a doubling lineage per round and measured 10x slower on
  * the same graph).
  */
object LabelPropagation {

  /** (node, communityLabel) after `rounds` synchronous sweeps. Input
    * may contain duplicates and either orientation; isolated nodes
    * (no edges) do not appear. */
  def labels(edges0: RDD[(Long, Long)], rounds: Int): RDD[(Long, Long)] = {
    require(rounds >= 1, s"label propagation needs >= 1 round, got $rounds")
    val numParts = math.max(edges0.getNumPartitions, 1)
    val part = new HashPartitioner(numParts)

    val sym = edges0.filter(p => p._1 != p._2)
      .flatMap(p => Iterator(p, p.swap))
      .distinct(numParts)
      .persist(StorageLevel.MEMORY_AND_DISK)

    var lab: RDD[(Long, Long)] = sym.keys.distinct(numParts)
      .map(v => (v, v))
      .persist(StorageLevel.MEMORY_AND_DISK)

    for (_ <- 1 to rounds) {
      val next = sym.join(lab, part)
        // neighbor label votes: (dst, label) -> count
        .map { case (_, (dst, l)) => ((dst, l), 1L) }
        .reduceByKey(part, _ + _)
        // plurality, ties to the smallest label
        .map { case ((v, l), n) => (v, (n, l)) }
        .reduceByKey(part, (a, b) =>
          if (a._1 != b._1) { if (a._1 > b._1) a else b }
          else { if (a._2 <= b._2) a else b })
        .mapValues(_._2)
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the parent
      lab.unpersist(blocking = false)
      lab = next
    }
    lab
  }
}
