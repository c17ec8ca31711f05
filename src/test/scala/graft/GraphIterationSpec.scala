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

  test("random graph: distributed LPA equals the local reference") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = lpa(edges, rounds = 3)
    // local synchronous plurality/min-tie reference
    val sym = (edges ++ edges.map(_.swap)).distinct
    val nbrs = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lab: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lab = nbrs.map { case (v, ns) =>
        val votes = ns.groupBy(lab).map { case (l, xs) => l -> xs.size }
        val maxN = votes.values.max
        v -> votes.filter(_._2 == maxN).keys.min
      }
    }
    assert(got == lab)
  }

  test("random graph: distributed PageRank equals the local reference") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(200)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = PageRank.ranks(
      spark.sparkContext.parallelize(edges, 4), rounds = 3).collect().toMap
    val sym = (edges ++ edges.map(_.swap)).distinct
    val out = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    val n = out.size
    var pr: Map[Long, Double] = out.keys.map(v => v -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val contrib = out.toSeq.flatMap { case (v, ns) =>
        ns.map(d => d -> pr(v) / ns.size)
      }.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      pr = contrib.map { case (v, c) => v -> (0.15 / n + 0.85 * c) }
    }
    assert(got.keySet == pr.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - pr(v)) < 1e-9) }
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
