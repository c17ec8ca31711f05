package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: a two-phase aggregation that
  * decomposes groupBy(key).agg(...) into
  * groupBy(key, salt).partial → groupBy(key).final.
  *
  * At 100 TB a single hot key (one viral document, one null-ish
  * default id) turns a groupBy into a one-task straggler; salting
  * spreads the hot key over `salts` partial groups first. AQE's
  * skew-join split covers joins automatically; salting is the same
  * medicine for aggregation, where AQE cannot split a group. Only
  * algebraic aggregates decompose this way (sum/count/min/max — avg as
  * sum+count); the helper exposes exactly those.
  */
object Salting {

  /** Salted sum/count aggregation over `key`: identical result to the
    * direct groupBy, skew-proof execution. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }
}
