package graft

import graft.ops.ConnectedComponents
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation

/** Star-contraction connected components: correctness vs a local
  * union-find oracle, O(log n)-round convergence on deep chains (the
  * case diameter-bound label propagation cannot finish), and the
  * no-driver-materialization guarantee on the q93 surface. */
class ConnectedComponentsSpec extends SparkSuite {

  private def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // roots are minimal only if union always attached the larger root —
    // done above — but path order can still leave min != root; normalize
    // by a second pass mapping every node to min over its component
    val byRoot = parent.keys.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] =
    ConnectedComponents.labels(spark.sparkContext.parallelize(edges, parts))
      .collect().toMap

  test("200-hop chain converges (diameter >> round cap) with min label") {
    // plain min-label propagation needs 200 sweeps and would hit the
    // 50-round cap; star contraction must finish well inside it
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 201)
    assert(got.values.forall(_ == 0L))
  }

  test("duplicate-heavy graph: many large overlapping components") {
    // every node participates in a component (the web-corpus shape the
    // driver-resident design assumed away): 3 dense blobs + a chain
    // stitching two of them + reversed/duplicated/self-loop edges
    val rnd = new scala.util.Random(7)
    val blob = (base: Long, n: Int) =>
      (1 until n).map(i => (base + i.toLong, base + rnd.nextInt(i).toLong))
    val edges = blob(0L, 400) ++ blob(1000L, 400) ++ blob(2000L, 300) ++
      (0L until 30L).map(i => (3000L + i, 3001L + i)) ++
      Seq((3000L, 17L), (3030L, 1003L)) ++ // stitch chain into blobs 1+2
      Seq((5L, 5L)) ++ // self-loop noise
      blob(0L, 400).map(_.swap) // duplicate + reversed
    val got = run(edges, parts = 8)
    val want = ufLabels(edges.filter(e => e._1 != e._2))
    assert(got == want)
    // blobs 1 and 2 merged through the chain => label 0 for all three
    assert(got(1003L) == 0L && got(3015L) == 0L)
    assert(got(2299L) == 2000L)
  }

  test("randomized graphs match union-find oracle across layouts") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(200)
      val m = n + rnd.nextInt(3 * n)
      val edges = (0 until m).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val got = run(edges, parts = 1 + rnd.nextInt(7))
      assert(got == ufLabels(edges), s"trial $trial (n=$n m=$m)")
    }
  }

  test("empty edge set yields empty labels without iterating") {
    assert(run(Seq.empty).isEmpty)
  }

  test("q93 result plan is distributed — no driver-side label relation") {
    val df = SparkEntry.queries("q93_dedup_clusters")(spark, sf)
    // the old design collected labels to the driver and returned a
    // LocalRelation; the distributed labeling must come back as an
    // RDD-backed logical plan
    val locals = df.queryExecution.analyzed.collect { case l: LocalRelation => l }
    assert(locals.isEmpty, "q93 plan contains a driver-materialized LocalRelation")
    assert(df.count() > 0)
  }
}
