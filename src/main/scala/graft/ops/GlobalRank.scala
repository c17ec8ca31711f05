package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global row numbers / running sums over a total order —
  * the two-phase range-partition pattern, built as ONE logical plan.
  *
  * The scale problem: an unpartitioned `Window.orderBy(...)` funnels
  * the entire dataset through a single WindowExec task; at 100 TB that
  * task never finishes. The classic fix is range-partition on the sort
  * key, number rows locally per partition, and add per-partition prefix
  * offsets. The TRAP in that fix is computing the offsets with a
  * driver-side `collect()` of the per-partition counts: that splits the
  * computation into two ACTIONS over the same range exchange, and
  * `repartitionByRange` samples its partition bounds with a
  * per-execution seed — the two actions can disagree on the layout and
  * silently corrupt every rank (a `.cache()` only masks it until
  * eviction). See the round-4 fix in [[Quantiles]] (commit `898b510`).
  *
  * Here everything is one plan: the counts/offsets branch and the
  * ranked branch share the SAME range exchange (ReuseExchange dedupes
  * them — one execution, one layout), and the prefix sum runs as a
  * window over the per-partition COUNTS table, which has at most one
  * row per partition — bounded by cluster width, never by data size.
  * Nothing is collected, and there is no SECOND ACTION anywhere.
  *
  * The sorted/numbered intermediate IS cached (`MEMORY_AND_DISK` via
  * `.cache()`), for a different reason than the rejected two-action
  * layout ever had: exchange reuse dedupes only the SHUFFLE — every
  * consumer branch of the exchange re-runs its own
  * sortWithinPartitions over the full data, and callers that compose
  * (quantile bounds + clip passes, rank + group-firsts) fan out to
  * 4-8 consumer branches, each paying a full-data sort (measured 3×
  * the whole query cost at sf0.1). Caching the narrow
  * (sortCols, value, pid, position) projection makes the scan + sort
  * + shuffle happen once; the branches re-read the cached blocks. If
  * a block is evicted mid-query, the branch recomputes THROUGH THE
  * SAME materialized exchange (partition bounds cannot diverge within
  * one execution; only tie order can shift, and callers' asserts trip
  * on any rank inconsistency), so this cache is an operational
  * dedup — correctness never depends on it.
  */
object GlobalRank {

  /** All rows of the tiny counts table share this constant partition
    * key — single-partition ON PURPOSE (≤ one row per DATA partition
    * flows through the window) without WindowExec's "No Partition
    * Defined" warning drowning real log anomalies. It must be derived
    * from a column, not `lit(0)`: Spark 4's EliminateWindowPartitions
    * strips foldable partition expressions, which would restore the
    * empty spec and the warning. */
  private[ops] def constKey(pidCol: Column): Column = pmod(pidCol, lit(1))

  /** Prefix window over the tiny per-partition counts table. */
  private def countsWindow: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(constKey(col("_gr_pid"))).orderBy(col("_gr_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)

  /** The CACHED sorted table `local` — the input rows plus `_gr_pid`
    * (range partition id) and `_gr_lrn` (1-based position within the
    * partition) — and the tiny `offsets` table (`_gr_pid`, `_gr_off`
    * [, totalCol]) whose broadcast join turns local positions into
    * global ones. Exposed so composing operators (quantiles,
    * winsorize) can take EXTRA passes over the cached table without
    * re-running the joins. */
  private[ops] case class LocalOffsets(local: DataFrame, offsets: DataFrame)

  /** Core of [[withRowNumbers]]: range-sort + local positions via
    * `monotonically_increasing_id` — it encodes exactly
    * (partition id << 33) + row-position-in-partition as a narrow
    * codegen'd projection, where a `Window.partitionBy(pid)` would
    * re-shuffle and re-sort data the exchange just ordered. Ties in
    * `sortCols` get arbitrary but CONSISTENT numbers — pass a
    * tie-breaking column for determinism. */
  private[ops] def localOffsets(
      df: DataFrame,
      sortCols: Seq[Column],
      totalCol: Option[String] = None): LocalOffsets = {
    val local = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_gr_mid", monotonically_increasing_id())
      .withColumn("_gr_pid", shiftright(col("_gr_mid"), 33).cast("int"))
      .withColumn("_gr_lrn", col("_gr_mid").bitwiseAND(lit((1L << 33) - 1)) + 1)
      .drop("_gr_mid")
      .cache() // see object doc: dedups the per-branch sort, not the exchange
    // the MID local position is 33 bits; a partition would need 8.5
    // billion rows to overflow it — fail loud rather than rank wrong if
    // the partitioning is ever that degenerate
    val counts = local.groupBy(col("_gr_pid")).agg(count(lit(1)).as("_gr_cnt"))
      .withColumn("_gr_cnt", when(col("_gr_cnt") >= (1L << 33), raise_error(lit(
        "global rank: a partition exceeds 2^33 rows — repartition finer first")))
        .otherwise(col("_gr_cnt")))
    val base = counts
      .withColumn("_gr_off", coalesce(sum(col("_gr_cnt")).over(countsWindow), lit(0L)))
    val offsets = totalCol match {
      case Some(t) => base
        .withColumn(t, sum(col("_gr_cnt"))
          .over(Window.partitionBy(constKey(col("_gr_pid")))))
        .select(col("_gr_pid"), col("_gr_off"), col(t))
      case None => base.select(col("_gr_pid"), col("_gr_off"))
    }
    LocalOffsets(local, offsets)
  }

  /** Adds a 1-based global row number `rnCol` over the total order of
    * `sortCols` (and optionally the total row count `totalCol`, the
    * same long on every row) to `df` — distributed, one plan. */
  def withRowNumbers(
      df: DataFrame,
      sortCols: Seq[Column],
      rnCol: String,
      totalCol: Option[String] = None): DataFrame = {
    val lo = localOffsets(df, sortCols, totalCol)
    lo.local.join(broadcast(lo.offsets), "_gr_pid")
      .withColumn(rnCol, col("_gr_lrn") + col("_gr_off"))
      .drop("_gr_pid", "_gr_lrn", "_gr_off")
  }

  /** Adds the global running sum `outCol` of long column `valueCol`
    * (inclusive of the current row) over the total order of `sortCols`
    * — distributed, one plan.
    *
    * The local cumulative sum runs as a narrow `mapPartitions` in the
    * order the range exchange already produced (a
    * `Window.partitionBy(pid)` would re-shuffle and re-sort); the
    * per-partition totals then turn local into global sums through the
    * same bounded counts-table window as [[withRowNumbers]].
    * `valueCol` must be a non-null long — filter/coalesce first. A
    * NULL raises in-plan with a readable message (same fail-loud
    * stance as the weighted-quantile negative-weight check) instead
    * of surfacing as an opaque executor NPE from `getLong`. */
  def withRunningSum(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: String,
      outCol: String): DataFrame =
    withRunningSums(df, sortCols, Seq(valueCol -> outCol))

  /** Multi-column form of [[withRunningSum]]: every (valueCol, outCol)
    * pair gets its global running sum over ONE range exchange, one
    * local sort, one narrow cumulative pass, and one offsets join —
    * callers needing several cumulative columns on the same order
    * (the KS statistic's two sample counts, debit/credit balances)
    * previously paid a full re-exchange per column. */
  def withRunningSums(
      df: DataFrame,
      sortCols: Seq[Column],
      valueOuts: Seq[(String, String)]): DataFrame = {
    require(valueOuts.nonEmpty, "withRunningSums needs at least one (value, out) pair")
    val guarded = valueOuts.foldLeft(df) { case (d, (v, _)) =>
      d.withColumn(v, when(col(v).isNull, raise_error(lit(
        s"running sum: NULL in value column '$v' — filter/coalesce first")))
        .otherwise(col(v)))
    }
    val parted = guarded.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_gr_pid", spark_partition_id())
    val vIdxs: Array[Int] =
      valueOuts.map { case (v, _) => parted.schema.fieldIndex(v) }.toArray
    val outSchema = valueOuts.indices.foldLeft(parted.schema)((sc, i) =>
      sc.add(s"_gr_lcw$i", LongType, false))
    val nVals = vIdxs.length
    val local = parted.mapPartitions { it =>
      val accs = new Array[Long](nVals)
      it.map { r =>
        val extra = new Array[Any](nVals)
        var i = 0
        while (i < nVals) { accs(i) += r.getLong(vIdxs(i)); extra(i) = accs(i); i += 1 }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(Encoders.row(outSchema))
      .cache() // see object doc: dedups the per-branch sort, not the exchange
    // partition total = sum of the VALUES, not max of the cumsum — the
    // two agree only for non-negative values, and this helper makes no
    // sign assumption (a running net-balance is a legitimate caller)
    val totalAggs = valueOuts.zipWithIndex.map { case ((v, _), i) =>
      sum(col(v)).as(s"_gr_t$i") }
    val totals = local.groupBy(col("_gr_pid")).agg(totalAggs.head, totalAggs.tail: _*)
    val offsets = valueOuts.indices.foldLeft(totals)((d, i) =>
        d.withColumn(s"_gr_off$i",
          coalesce(sum(col(s"_gr_t$i")).over(countsWindow), lit(0L))))
      .select(col("_gr_pid") +: valueOuts.indices.map(i => col(s"_gr_off$i")): _*)
    val joined = valueOuts.zipWithIndex
      .foldLeft(local.join(broadcast(offsets), "_gr_pid")) {
        case (d, ((_, out), i)) =>
          d.withColumn(out, col(s"_gr_lcw$i") + col(s"_gr_off$i"))
      }
    joined.drop("_gr_pid" +:
      valueOuts.indices.flatMap(i => Seq(s"_gr_lcw$i", s"_gr_off$i")): _*)
  }
}
