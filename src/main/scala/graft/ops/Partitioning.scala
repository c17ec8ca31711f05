package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned layout + partition pruning: the other half of the
  * 100 TB ingest story (bucketing co-locates join keys; partitioning
  * prunes scans by the dominant filter dimension, typically time).
  *
  * A year-partitioned orders table turns a one-year query from a full
  * scan into a single-directory read — at 100 TB that is the
  * difference between touching 100 TB and touching 14 TB. The spec
  * asserts the pruning actually happens (PartitionFilters in the scan,
  * only matching files read).
  */
object Partitioning {

  /** Write `df` partitioned by a derived year column. */
  def writePartitionedByYear(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("part_year", year(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("part_year")
      .parquet(path)

  /** Read back with a partition filter — Catalyst prunes directories
    * before any file is opened. */
  def readYear(spark: SparkSession, path: String, yr: Int): DataFrame =
    spark.read.parquet(path).filter(col("part_year") === yr)

  /** True if the scan carries a partition filter (pruning active). */
  def hasPartitionPruning(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.linesIterator
      .exists(l => l.contains("PartitionFilters") && l.contains("part_year"))
}
