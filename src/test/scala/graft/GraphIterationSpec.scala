package graft

import graft.ops.{ConnectedComponents, LabelPropagation, PageRank}

/** The RDD graph-iteration operators behind q160/q203 on constructed
  * graphs: label propagation must keep bridged-but-distinct
  * communities apart where components merge them, plurality ties
  * must resolve to the smallest label, and PageRank mass must stay
  * normalized with hubs ranked above leaves. */
class GraphIterationSpec extends SparkSuite {

  private def lpa(edges: Seq[(Long, Long)], rounds: Int = 3): Map[Long, Long] =
    LabelPropagation.labels(spark.sparkContext.parallelize(edges, 4), rounds)
      .collect().toMap

  test("barbell: two cliques with one bridge stay two communities") {
    // K4 on 0-3 + K4 on 10-13, bridged 3-10: components collapse to
    // one label, plurality propagation keeps the clique majorities
    def k4(base: Long) = for {
      i <- 0 to 3; j <- (i + 1) to 3
    } yield (base + i, base + j)
    val edges = k4(0L) ++ k4(10L) :+ (3L -> 10L)
    val communities = lpa(edges).groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(communities.exists(_.intersect(Set(0L, 1L, 2L)).size == 3))
    assert(communities.exists(_.intersect(Set(11L, 12L, 13L)).size == 3))
    assert(communities.size >= 2)
    val cc = ConnectedComponents.labels(
      spark.sparkContext.parallelize(edges, 4)).collect().toMap
    assert(cc.values.toSet.size == 1) // components see one blob
  }

  test("plurality tie resolves to the smallest label (triangle)") {
    // in a triangle every node sees two single-vote neighbor labels:
    // round 1 must pick the smaller; the graph converges to min-label
    val got = lpa(Seq((1L, 2L), (2L, 3L), (1L, 3L)), rounds = 1)
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("pagerank: mass conserved, star hub outranks leaves") {
    val star = (1L to 6L).map(leaf => (0L, leaf))
    val pr = PageRank.ranks(
      spark.sparkContext.parallelize(star, 4), rounds = 3).collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9) // undirected: no mass leak
    val hub = pr(0L)
    assert((1L to 6L).forall(l => pr(l) < hub))
    // leaves are symmetric — identical ranks
    assert((1L to 6L).map(pr).distinct.size == 1)
  }
}
