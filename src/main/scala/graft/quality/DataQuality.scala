package graft.quality

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import graft.config.PipelineConfig

/** Data-quality rule engine (reference `data_quality_checks.py:16-89`):
  * row-count floor, per-column null fractions vs thresholds, required
  * columns, missing columns.
  *
  * The reference runs one full pass per column
  * (`data_quality_checks.py:41-49`); here ALL statistics come from a
  * single fused aggregate — one scan, one partial+final
  * HashAggregate, a 1-row result. At 100 TB that is the difference
  * between N scans and 1.
  */
object DataQuality {

  final case class FailedCheck(
    checkType: String, // row_count_below_min | required_column_has_nulls | null_fraction_exceeded | missing_column
    column: String, // "" for table-level checks
    observed: Double,
    threshold: Double,
    message: String)

  final case class DqReport(
    rowCount: Long,
    nullFractions: Map[String, Double],
    failedChecks: Seq[FailedCheck]) {
    def passed: Boolean = failedChecks.isEmpty
  }

  final class DataQualityException(val report: DqReport)
    extends RuntimeException(
      s"Data quality checks failed: ${report.failedChecks.map(_.message).mkString("; ")}")

  /** Compute the report in one aggregate pass over `df`. `missing` =
    * declared columns absent from the source (schema-level check A4 —
    * no data pass needed). */
  def check(df: DataFrame, cfg: PipelineConfig, missing: Seq[String]): DqReport = {
    val present = cfg.columns.filter(c => df.columns.contains(c.name))
    // A1 + A2 fused: count + null fraction per declared column, one pass
    val aggRow = df.agg(
      count(lit(1)).as("row_count"),
      present.map(c => avg(col(c.name).isNull.cast("double")).as(s"nf_${c.name}")): _*
    ).collect()(0)
    val rowCount = aggRow.getAs[Long]("row_count")
    val nullFractions = present.map(c =>
      c.name -> (if (rowCount == 0) 0.0 else aggRow.getAs[Double](s"nf_${c.name}"))).toMap

    DqReport(rowCount, nullFractions,
      evalRules(cfg, present, missing, rowCount, nullFractions))
  }

  /** Raise on failure, mirroring `enforce_data_quality`
    * (`data_quality_checks.py:85-89`). */
  def enforce(df: DataFrame, cfg: PipelineConfig, missing: Seq[String]): DqReport = {
    val report = check(df, cfg, missing)
    if (!report.passed) throw new DataQualityException(report)
    report
  }

  /** Sink write + DQ report from ONE scan: the metrics ride the write
    * job via Dataset.observe instead of a second aggregate pass — at
    * 100 TB this halves the pipeline's read volume versus
    * write-then-check. The observed-metrics row is delivered on the
    * listener bus after the action; we block (bounded) for it.
    *
    * Rule evaluation is shared with [[check]] via [[evalRules]], so the
    * two paths can never drift. */
  def writeWithObservedDq(df: DataFrame, cfg: PipelineConfig, missing: Seq[String],
      sinkPath: String, timeoutSec: Long = 60): DqReport = {
    val spark = df.sparkSession
    val present = cfg.columns.filter(c => df.columns.contains(c.name))
    val metricName = s"graft_dq_${java.util.UUID.randomUUID().toString.take(8)}"
    val observed = df.observe(metricName,
      count(lit(1)).as("row_count"),
      present.map(c => avg(col(c.name).isNull.cast("double")).as(s"nf_${c.name}")): _*)

    val latch = new CountDownLatch(1)
    @volatile var metricsRow: Option[Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get(metricName).foreach { row =>
          metricsRow = Some(row); latch.countDown()
        }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      observed.write.mode("overwrite").parquet(sinkPath)
      if (!latch.await(timeoutSec, TimeUnit.SECONDS))
        throw new IllegalStateException(
          s"observed DQ metrics '$metricName' not delivered within ${timeoutSec}s")
    } finally spark.listenerManager.unregister(listener)

    val row = metricsRow.get
    val rowCount = row.getAs[Long]("row_count")
    // guard BEFORE getAs: avg over zero rows is null, and unboxing a
    // null Double NPEs
    val nullFractions = present.map(c =>
      c.name -> (if (rowCount == 0) 0.0 else row.getAs[Double](s"nf_${c.name}"))).toMap
    DqReport(rowCount, nullFractions, evalRules(cfg, present, missing, rowCount, nullFractions))
  }

  /** Shared rule evaluation (A3/A4/A5 + row-count floor) over computed
    * statistics — used by both the aggregate and the observed paths. */
  private def evalRules(cfg: PipelineConfig, present: Seq[graft.config.ColumnSpec],
      missing: Seq[String], rowCount: Long,
      nullFractions: Map[String, Double]): Seq[FailedCheck] = {
    val failed = Seq.newBuilder[FailedCheck]
    missing.foreach(m => failed += FailedCheck(
      "missing_column", m, 0.0, 0.0, s"Column '$m' is missing from the source"))
    if (rowCount < cfg.quality.rowCountMin) failed += FailedCheck(
      "row_count_below_min", "", rowCount.toDouble, cfg.quality.rowCountMin.toDouble,
      s"Row count $rowCount below minimum ${cfg.quality.rowCountMin}")
    present.foreach { c =>
      val nf = nullFractions(c.name)
      if (c.required && nf > 0.0) failed += FailedCheck(
        "required_column_has_nulls", c.name, nf, 0.0,
        s"Required column '${c.name}' has null fraction $nf")
      c.maxNullFraction.foreach { maxNf =>
        if (nf > maxNf) failed += FailedCheck(
          "null_fraction_exceeded", c.name, nf, maxNf,
          s"Column '${c.name}' null fraction $nf exceeds max $maxNf")
      }
    }
    failed.result()
  }
}
