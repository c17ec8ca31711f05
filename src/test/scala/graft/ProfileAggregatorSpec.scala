package graft

import org.apache.spark.sql.functions._
import graft.functions.ProfileAggregator

/** Pins the typed UDAF to the built-in aggregates value-for-value and
  * checks the reference's edge contracts (n==1 std, null handling). */
class ProfileAggregatorSpec extends SparkSuite {
  import spark.implicits._

  test("profile_agg matches avg/stddev_samp/null-fraction builtins on lineitem") {
    ProfileAggregator.register(spark)
    val li = Tables(spark, sf, "lineitem")
    val got = li.selectExpr("profile_agg(l_quantity) AS p")
      .select("p.mean", "p.std", "p.nullFraction").head
    val exp = li.agg(
      avg(col("l_quantity")),
      coalesce(stddev_samp(col("l_quantity")), lit(0.0)),
      avg(col("l_quantity").isNull.cast("double"))).head
    assert(math.abs(got.getDouble(0) - exp.getDouble(0)) < 1e-9)
    assert(math.abs(got.getDouble(1) - exp.getDouble(1)) < 1e-9)
    assert(got.getDouble(2) == exp.getDouble(2))
  }

  test("profile_agg per-group with nulls; n==1 std pinned to 0.0") {
    ProfileAggregator.register(spark)
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(5.0)),
      ("c", None))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(expr("profile_agg(v) AS p"))
      .select(col("k"), col("p.mean"), col("p.std"), col("p.nullFraction"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("a")._1 == 2.0)
    assert(math.abs(out("a")._2 - math.sqrt(2.0)) < 1e-12)
    assert(math.abs(out("a")._3 - 1.0 / 3.0) < 1e-12)
    assert(out("b") == ((5.0, 0.0, 0.0))) // single value: std 0.0, not null
    assert(out("c")._1.isNaN && out("c")._2 == 0.0 && out("c")._3 == 1.0)
  }

  test("randomized: matches builtins across partition layouts with nulls") {
    ProfileAggregator.register(spark)
    val rnd = new scala.util.Random(42L)
    val data = Seq.fill(500)(
      if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble() * 1000 - 500))
    for (parts <- Seq(1, 7, 64)) { // 64 > rows/8 forces empty partitions
      val df = data.toDF("v").repartition(parts)
      val got = df.selectExpr("profile_agg(v) AS p")
        .select("p.mean", "p.std", "p.nullFraction").head
      val exp = df.agg(avg(col("v")),
        coalesce(stddev_samp(col("v")), lit(0.0)),
        avg(col("v").isNull.cast("double"))).head
      assert(math.abs(got.getDouble(0) - exp.getDouble(0)) < 1e-9, s"mean @$parts")
      assert(math.abs(got.getDouble(1) - exp.getDouble(1)) < 1e-9, s"std @$parts")
      assert(got.getDouble(2) == exp.getDouble(2), s"nullFrac @$parts")
    }
  }

  test("profile_agg agrees with DriftDetector.profile on the golden fixture") {
    ProfileAggregator.register(spark)
    val df = Tables(spark, sf, "customer").select("c_acctbal")
    val viaUdaf = df.selectExpr("profile_agg(c_acctbal) AS p")
      .select("p.mean", "p.std").head
    val viaDetector = drift.DriftDetector.profile(df).head
    assert(math.abs(viaUdaf.getDouble(0) - viaDetector.mean) < 1e-9)
    assert(math.abs(viaUdaf.getDouble(1) - viaDetector.std) < 1e-9)
  }
}
