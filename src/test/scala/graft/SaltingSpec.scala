package graft

import org.apache.spark.sql.functions._
import graft.ops.Salting

/** Salted two-phase aggregation must be result-identical to the direct
  * groupBy on a deliberately skewed key distribution. */
class SaltingSpec extends SparkSuite {

  test("salted aggregation equals direct aggregation under heavy skew") {
    import spark.implicits._
    // 90% of rows share one hot key
    val skewed = spark.range(0, 100000)
      .select(when(col("id") % 10 =!= 0, lit("HOT")).otherwise(concat(lit("k"), col("id"))).as("key"),
        (col("id") % 97).cast("double").as("v"))

    val salted = Salting.saltedSumCount(skewed, "key", "v")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = skewed.groupBy("key")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (total, n)) =>
      val (st, sn) = salted(k)
      assert(sn == n, s"count mismatch for $k")
      assert(math.abs(st - total) < 1e-6 * math.max(1.0, math.abs(total)),
        s"sum mismatch for $k: $st vs $total")
    }
  }
}
