package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact linear-interpolation quantiles (the `percentile` /
  * `quantile_cont` semantics) computed WITHOUT a per-group value
  * buffer.
  *
  * Spark's `percentile` is a TypedImperativeAggregate that buffers a
  * value→count map per group — O(distinct values) executor memory, an
  * unbounded agg buffer on mostly-distinct doubles at 100 TB. This
  * operator instead materializes exact per-group ranks with the
  * two-phase global-row-number pattern (range repartition on
  * (group, value) → per-partition row_number → add per-partition
  * offsets; the only driver traffic is ONE scalar per partition,
  * bounded by cluster width) and then picks the two rank-adjacent
  * values each quantile interpolates between with a plain conditional
  * aggregation. Every stage is a shuffle Spark already does well:
  * nothing is buffered per group, nothing is collected per row, and
  * skewed groups spread over many range partitions instead of one
  * window task.
  *
  * Interpolation matches `percentile` exactly: pos = q·(n−1),
  * result = v[⌊pos⌋] + (v[⌈pos⌉] − v[⌊pos⌋])·(pos − ⌊pos⌋) — the same
  * double arithmetic, so results are bit-identical to the buffering
  * aggregate (and to DuckDB's quantile_cont).
  *
  * Rows whose value is NULL are ignored (as `percentile` does); a
  * group whose values are ALL null is absent from the output (where
  * `percentile` would emit a null row) — callers here never feed such
  * groups. A NULL group KEY is an ordinary group (null-safe joins
  * throughout), matching groupBy semantics.
  */
object Quantiles {

  /** Inner join on `keys` with NULL-SAFE equality — a plain equi-join
    * would silently drop any group whose key is NULL (the groupBy
    * side emits the null group; the join back would not match it). */
  private def nullSafeJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val renamed = keys.foldLeft(right)((df, k) => df.withColumnRenamed(k, s"_ns_$k"))
    val cond = keys.map(k => col(k) <=> col(s"_ns_$k")).reduce(_ && _)
    left.join(renamed, cond).drop(keys.map(k => s"_ns_$k"): _*)
  }

  /** One row per group: `groupCols ++ qs.map(_._1)` with each named
    * column holding the exact q-quantile of `valueCol`. `groupCols`
    * empty ⇒ a single global row. */
  def exactQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val gcols: Seq[Column] = groupCols.map(col)
    val v = df.select(gcols :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
    val sortCols = gcols :+ col("_v")

    // phase 1: global row numbers over the (group, value) total order —
    // never a single-partition window over the DATA (q67 pattern).
    // Local positions come from monotonically_increasing_id, which
    // after the range shuffle + local sort encodes exactly
    // (partition id << 33) + row-position-in-partition as a NARROW
    // codegen'd projection — a Window.partitionBy(pid) here would
    // re-shuffle and re-sort the whole dataset just to count rows it
    // already has in order. Range partition ids ascend in key order,
    // so prefix sums of the per-partition counts turn local positions
    // into global ranks. The prefix sum runs as a window over the
    // COUNTS TABLE (≤ one row per partition, bounded by cluster
    // width, not data size) inside the SAME plan: a driver collect
    // here would split the computation into two actions, and
    // repartitionByRange SAMPLES with a per-execution seed — two
    // actions can disagree on the partition bounds, silently
    // corrupting every rank. One plan ⇒ one exchange execution
    // (ReuseExchange) ⇒ one consistent layout; nothing is cached.
    val local = v.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftright(col("_mid"), 33).cast("int"))
      .withColumn("_lrn", col("_mid").bitwiseAND(lit((1L << 33) - 1)) + 1)
      .drop("_mid")
    val counts = local.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the MID local position is 33 bits; the range partitioner would
    // need an 8.5-billion-row partition to overflow it, but fail loud
    // rather than rank wrong if partitioning is ever that degenerate
    val offsets = counts
      .withColumn("_cnt", when(col("_cnt") >= (1L << 33), raise_error(lit(
        "exact quantiles: a partition exceeds 2^33 rows — repartition finer first")))
        .otherwise(col("_cnt")))
      .withColumn("_off", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_off"))
    val ranked = local.join(broadcast(offsets), "_pid")
      .withColumn("_rn", col("_lrn") + col("_off"))

    // phase 2: per-group 0-based rank from the group's first global row
    // number (groups are contiguous in the total order), then each
    // quantile's two bracketing values by conditional aggregation
    val grp =
      if (groupCols.isEmpty) ranked.agg(min(col("_rn")).as("_first"), count(lit(1)).as("_n"))
      else ranked.groupBy(gcols: _*).agg(min(col("_rn")).as("_first"), count(lit(1)).as("_n"))
    // global case: grp is provably ONE row — broadcast it. Grouped
    // case: grp is one row PER GROUP, which callers may make huge
    // (per-user quantiles) — no forced broadcast; AQE picks BHJ when
    // the runtime size is small and a shuffle join when it is not.
    val withRank =
      (if (groupCols.isEmpty) ranked.crossJoin(broadcast(grp))
       else nullSafeJoin(ranked, grp, groupCols))
        .withColumn("_gr", col("_rn") - col("_first"))

    def pos(q: Double): Column = lit(q) * (col("_n") - 1).cast("double")
    val picks = qs.flatMap { case (name, q) =>
      Seq(
        max(when(col("_gr") === floor(pos(q)).cast("long"), col("_v"))).as(s"_${name}_lo"),
        max(when(col("_gr") === ceil(pos(q)).cast("long"), col("_v"))).as(s"_${name}_hi"))
    } :+ max(col("_n")).as("_n_out")
    val agged =
      if (groupCols.isEmpty) withRank.agg(picks.head, picks.tail: _*)
      else withRank.groupBy(gcols: _*).agg(picks.head, picks.tail: _*)

    val posOut = (q: Double) => lit(q) * (col("_n_out") - 1).cast("double")
    agged.select(gcols ++ qs.map { case (name, q) =>
      (col(s"_${name}_lo") +
        (col(s"_${name}_hi") - col(s"_${name}_lo")) *
          (posOut(q) - floor(posOut(q)))).as(name)
    }: _*)
  }

  /** Exact WEIGHTED quantiles (type-1 / lower: the smallest value
    * whose running weight reaches q·totalWeight), per group. The
    * importance-weighted variant quota/temperature sampling cutoffs
    * need.
    *
    * Same bounded-state design as [[exactQuantiles]], with weighted
    * ranks instead of row ranks: range-partition on (group, value),
    * local weight cumsum per (partition, group) computed in PARTITION
    * ORDER by a narrow mapPartitions (a Window.partitionBy(pid) here
    * would re-shuffle and re-sort the whole dataset the range
    * exchange just ordered), then per-(partition, group) offsets turn
    * local into global running weights. Groups are CONTIGUOUS under
    * the range partitioning, so the offset table has at most
    * partitions + groups − 1 rows — the prefix window runs over that
    * small table, never the data. Weights must be integral (exact
    * cumulative sums; a double running weight would make the q·W
    * threshold crossing float-order-dependent and engine-divergent).
    * NULL group keys are retained (null-safe joins), matching
    * groupBy semantics. */
  def weightedQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    val gcols: Seq[Column] = groupCols.map(col)
    val v = df.select(gcols ++ Seq(col(valueCol).cast("double").as("_v"),
        col(weightCol).cast("long").as("_w")): _*)
      .filter(col("_v").isNotNull && col("_w").isNotNull)
    val sortCols = gcols :+ col("_v")

    val parted = v.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    // group columns sit at positions 0..n-1 of `parted` by
    // construction; the running sum resets at each group boundary and
    // rides the sort order the exchange already produced — no shuffle
    val nGroup = groupCols.length
    val outSchema = parted.schema.add("_lcw", org.apache.spark.sql.types.LongType, false)
    val local = parted.mapPartitions { it =>
      var acc = 0L
      var cur: Seq[Any] = null
      it.map { r =>
        val key = (0 until nGroup).map(r.get)
        if (cur == null || key != cur) { acc = 0L; cur = key }
        acc += r.getAs[Long]("_w")
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))

    // per-(partition, group) totals — ≤ partitions + groups − 1 rows;
    // the prefix window below runs over THIS table, not the data
    val pg = local.groupBy(col("_pid") +: gcols: _*).agg(max(col("_lcw")).as("_pgw"))
    val wOff = Window.partitionBy(gcols: _*).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = pg.withColumn("_off", coalesce(sum(col("_pgw")).over(wOff), lit(0L)))
      .select(col("_pid") +: gcols :+ col("_off"): _*)

    val grp =
      if (groupCols.isEmpty) v.agg(sum(col("_w")).as("_tw"))
      else v.groupBy(gcols: _*).agg(sum(col("_w")).as("_tw"))
    val ranked = nullSafeJoin(local, broadcast(offsets), "_pid" +: groupCols)
      .withColumn("_cw", col("_lcw") + col("_off"))
    val withTotal =
      if (groupCols.isEmpty) ranked.crossJoin(broadcast(grp))
      else nullSafeJoin(ranked, grp, groupCols)

    val picks = qs.map { case (name, q) =>
      min(when(col("_cw").cast("double") >= lit(q) * col("_tw").cast("double"),
        col("_v"))).as(name)
    }
    if (groupCols.isEmpty) withTotal.agg(picks.head, picks.tail: _*)
    else withTotal.groupBy(gcols: _*).agg(picks.head, picks.tail: _*)
  }
}
