package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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

    val failed = Seq.newBuilder[FailedCheck]
    // A4: missing declared columns
    missing.foreach(m => failed += FailedCheck(
      "missing_column", m, 0.0, 0.0, s"Column '$m' is missing from the source"))
    // table-level row-count floor (data_quality_checks.py:35-39)
    if (rowCount < cfg.quality.rowCountMin) failed += FailedCheck(
      "row_count_below_min", "", rowCount.toDouble, cfg.quality.rowCountMin.toDouble,
      s"Row count $rowCount below minimum ${cfg.quality.rowCountMin}")
    present.foreach { c =>
      val nf = nullFractions(c.name)
      // A3: required columns must be fully populated (:51-59)
      if (c.required && nf > 0.0) failed += FailedCheck(
        "required_column_has_nulls", c.name, nf, 0.0,
        s"Required column '${c.name}' has null fraction $nf")
      // A5: optional columns bounded by max_null_fraction (:61-71)
      c.maxNullFraction.foreach { maxNf =>
        if (nf > maxNf) failed += FailedCheck(
          "null_fraction_exceeded", c.name, nf, maxNf,
          s"Column '${c.name}' null fraction $nf exceeds max $maxNf")
      }
    }
    DqReport(rowCount, nullFractions, failed.result())
  }

  /** Raise on failure, mirroring `enforce_data_quality`
    * (`data_quality_checks.py:85-89`). */
  def enforce(df: DataFrame, cfg: PipelineConfig, missing: Seq[String]): DqReport = {
    val report = check(df, cfg, missing)
    if (!report.passed) throw new DataQualityException(report)
    report
  }
}
