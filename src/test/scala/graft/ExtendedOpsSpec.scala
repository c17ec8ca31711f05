package graft

/** Specs for extended ops whose oracle can't express the property. */
class ExtendedOpsSpec extends SparkSuite {

  test("approx_count_distinct stays within its declared error bound") {
    val rows = ops.Extended.queries("q50_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the query itself now carries the bound check (within_bound is
    // also asserted true by the DuckDB oracle against ITS exact count)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getAs[String]("l_returnflag")}: estimate out of bound, exact ${r.getAs[Long]("exact_parts")}")
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
