package graft

/** Specs for extended ops whose oracle can't express the property. */
class ExtendedOpsSpec extends SparkSuite {

  test("approx_count_distinct stays within its declared error bound") {
    val rows = ops.Extended.queries("q50_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      val rel = math.abs(approx - exact) / exact
      // rsd=0.02 declared; allow 5 sigma headroom
      assert(rel < 0.1, s"${r.getAs[String]("l_returnflag")}: approx $approx vs exact $exact")
    }
  }

  test("pivot row sums equal the unpivoted counts") {
    import org.apache.spark.sql.functions._
    val pivoted = ops.Extended.queries("q47_pivot")(spark, sf)
      .withColumn("row_total",
        col("n_urgent") + col("n_high") + col("n_medium") + col("n_notspec") + col("n_low"))
      .select("o_orderstatus", "row_total").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = Tables(spark, sf, "orders").groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pivoted == plain)
  }
}
