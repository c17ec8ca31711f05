package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins: pre-shuffle both sides of a repeated join
  * ONCE at write time, then join shuffle-free forever after.
  *
  * At 100 TB the fact⋈fact join (lineitem ⋈ orders) is the dominant
  * shuffle; bucketing both tables by the join key at load time removes
  * it from every downstream query. This module is the engine's
  * ingest-side answer (the reference's DuckDB warehouse has no
  * equivalent — single file, single process).
  */
object Bucketing {

  /** Write a table bucketed (and per-bucket sorted) by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket
    * count — plans as a SortMergeJoin with NO shuffle exchange on
    * either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    // resolve each side once: building the condition from fresh
    // spark.table() calls would depend on the relation cache returning
    // identical attribute ids
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** True if the executed plan of `df` contains a shuffle exchange. */
  def hasShuffleExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.linesIterator
      .exists(l => l.contains("Exchange hashpartitioning") ||
        l.contains("ShuffleExchange"))
}
