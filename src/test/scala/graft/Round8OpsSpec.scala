package graft

import org.apache.spark.sql.functions._

/** Output-level property pins for the round-8 operators whose
  * correctness has structure BEYOND the oracle hash — invariants that
  * must hold on any corpus, so a future fixture regeneration that
  * happens to hash-match garbage cannot slip through. */
class Round8OpsSpec extends SparkSuite {

  test("q276 waterfill: allocation is feasible, tight, and level-capped") {
    val rows = SparkEntry.queries("q276_token_waterfill")(spark, sf).collect()
    assert(rows.nonEmpty)
    val b = rows.head.getAs[Long]("budget")
    val cap = rows.head.getAs[Long]("cap_tokens")
    val m = rows.length.toLong
    val alloc = rows.map(_.getAs[Long]("allocation")).sum
    assert(alloc <= b, s"allocation $alloc exceeds budget $b")
    assert(b - alloc < m, s"slack ${b - alloc} >= m $m — cap not tight")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val a = r.getAs[Long]("allocation")
      if (r.getAs[Long]("capped") == 1L)
        assert(a == cap && n > cap, s"capped row not at level: $r")
      else assert(a == n && n <= cap, s"uncapped row not whole: $r")
    }
  }

  test("q265 weighted jaccard: scores in (0, 1], identical docs score 1") {
    val rows = SparkEntry.queries("q265_weighted_jaccard")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wj = r.getAs[Double]("weighted_jaccard")
      assert(wj > 0.0 && wj <= 1.0 + 1e-9, s"out-of-range score: $r")
    }
    // exact text duplicates must appear with weighted jaccard 1:
    // every numerator shingle weight also appears in both denominators
    val docs = Tables(spark, sf, "documents")
    val dupPair = docs.as("a")
      .join(docs.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).limit(1).collect()
    dupPair.foreach { p =>
      val hit = rows.find(r => r.getAs[Long]("d1") == p.getLong(0) &&
        r.getAs[Long]("d2") == p.getLong(1))
      assert(hit.isDefined, s"identical pair $p missing from q265")
      assert(math.abs(hit.get.getAs[Double]("weighted_jaccard") - 1.0) < 1e-6)
    }
  }

  test("q271 reconciliation buckets partition the order table") {
    val rows = SparkEntry.queries("q271_order_reconciliation")(spark, sf)
      .collect()
    val nOrders = Tables(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == nOrders,
      "buckets must partition all orders exactly once")
  }

  test("q270 churn deciles cover all first-half users with sane rates") {
    val rows = SparkEntry.queries("q270_churn_by_decile")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSet.subsetOf((1L to 10L).toSet))
    rows.foreach { r =>
      val rate = r.getAs[Double]("churn_rate")
      assert(rate >= 0.0 && rate <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_churned") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("min_acts") <= r.getAs[Long]("max_acts"))
    }
    // deciles ordered by activity: max_acts non-decreasing across deciles
    val sorted = rows.sortBy(_.getAs[Long]("decile"))
    sorted.init.zip(sorted.tail).foreach { case (lo, hi) =>
      assert(lo.getAs[Long]("max_acts") <= hi.getAs[Long]("min_acts") ||
        lo.getAs[Long]("max_acts") <= hi.getAs[Long]("max_acts"),
        s"decile activity ranges out of order: $lo vs $hi")
    }
  }

  test("q257 bootstrap CI brackets are ordered and counts exact") {
    val rows = SparkEntry.queries("q257_bootstrap_ci")(spark, sf).collect()
    val nByType = Tables(spark, sf, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("event_type")).toSet == nByType.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") == nByType(r.getAs[String]("event_type")))
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"),
        s"inverted CI: $r")
    }
  }
}
