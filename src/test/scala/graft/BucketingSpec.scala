package graft

import org.apache.spark.sql.functions._
import graft.ops.Bucketing

/** Bucketed co-located join: after bucketing both fact tables by the
  * join key, the join must plan WITHOUT a shuffle exchange, and return
  * the same result as the plain shuffled join. */
class BucketingSpec extends SparkSuite {

  test("bucketed lineitem-orders join is shuffle-free and result-identical") {
    val li = Tables(spark, sf, "lineitem")
    val o = Tables(spark, sf, "orders")
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 8)

    val bucketed = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders",
      "l_orderkey", "o_orderkey")
    // the join itself must not shuffle either side
    assert(!Bucketing.hasShuffleExchange(bucketed),
      "bucketed join should have no shuffle exchange:\n" +
        bucketed.queryExecution.executedPlan.toString.take(2000))

    val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(bucketed.count() == expected)

    // and the plain join DOES shuffle — the exchange really was removed,
    // not absent for size reasons (broadcast is disabled for the probe)
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      assert(Bucketing.hasShuffleExchange(plain))
    }
  }

  private def withSqlConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
