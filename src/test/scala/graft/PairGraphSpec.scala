package graft

import org.apache.spark.sql.functions._
import graft.llm.{PairGraph, StateStores, TextDedup}

/** The persisted pair-graph contracts: the serve store must reproduce
  * the in-plan derivation bit-for-bit, and the incremental
  * maintenance (q283) must retract cap-crossing credits so the
  * maintained graph equals the from-scratch rebuild. */
class PairGraphSpec extends SparkSuite {

  private def docs = Tables(spark, sf, "documents")

  test("served jaccard pairs ≡ in-plan jaccardPairs at 0.5 and 0.8") {
    Seq(0.5, 0.8).foreach { thr =>
      val served = PairGraph.jaccard(spark, sf, thr)
        .orderBy(col("d1"), col("d2")).collect()
      val direct = TextDedup.jaccardPairs(docs, thr)
        .orderBy(col("d1"), col("d2")).collect()
      assert(served.length == direct.length, s"pair count at $thr")
      served.zip(direct).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1))
        assert(a.getDouble(2) == b.getDouble(2),
          s"served jaccard must be bit-identical at $thr")
      }
    }
  }

  test("consumer plans scan the store, not the corpus text") {
    PairGraph.jaccard(spark, sf, 0.5).collect() // force-seed
    val plan = PairGraph.jaccard(spark, sf, 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("pair_graph_v1"),
      s"consumer must read the persisted store:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"a documents scan in a consumer plan means the store is being rebuilt:\n$plan")
  }

  test("q283: retractions fire on this fixture and the maintained graph matches the rebuild") {
    val rows = SparkEntry.queries("q283_pair_graph_ivm")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_mismatch") == 0L,
        s"gen ${r.getAs[Long]("gen")}: maintained pair graph diverged from rebuild")
    }
    assert(rows.map(_.getAs[Long]("n_retract")).sum > 0L,
      "the cap-crossing retraction path must actually exercise on this fixture " +
        "(lower IvmCap if the fixture's df profile changed)")
  }

  test("ivmDeltas reads persisted state only — never document text") {
    // q283 has just run (previous test), so the state tables exist
    val path = StateStores.statePath(sf, "pair_ivm")
    val plan = PairGraph.ivmDeltas(spark, path, gen = 2, cap = PairGraph.IvmCap)
      .queryExecution.analyzed.toString
    assert(!plan.contains("documents"),
      s"maintenance deltas must derive from state tables alone:\n$plan")
  }
}
