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
  * two-phase global-row-number pattern ([[GlobalRank.withRowNumbers]]:
  * range repartition on (group, value) → local positions → per-partition
  * prefix offsets computed in the SAME plan) and then picks the two
  * rank-adjacent values each quantile interpolates between with a plain
  * conditional aggregation. Every stage is a shuffle Spark already does
  * well: nothing is buffered per group, nothing is collected per row,
  * and skewed groups spread over many range partitions instead of one
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
  *
  * Rank integrity is ASSERTED in-plan: the per-group rank span must
  * tile exactly 0..n−1. Correctness rests on the counts branch and the
  * ranked branch reading ONE execution of the range exchange
  * (ReuseExchange); if that ever fails — `spark.sql.exchange.reuse`
  * disabled, canonicalization divergence — the layouts can differ and
  * every rank silently shifts. The span check turns that silent
  * corruption into a loud error for the price of two extra aggregate
  * columns. */
object Quantiles {

  /** Inner join on `keys` with NULL-SAFE equality — a plain equi-join
    * would silently drop any group whose key is NULL (the groupBy
    * side emits the null group; the join back would not match it).
    * `hint` optionally marks the right side (e.g. "broadcast"). */
  private def nullSafeJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], broadcastRight: Boolean = false): DataFrame = {
    val renamed = keys.foldLeft(right)((df, k) => df.withColumnRenamed(k, s"_ns_$k"))
    val r = if (broadcastRight) broadcast(renamed) else renamed
    val cond = keys.map(k => col(k) <=> col(s"_ns_$k")).reduce(_ && _)
    left.join(r, cond).drop(keys.map(k => s"_ns_$k"): _*)
  }

  /** Shared core: the cached sorted table plus rows as (groupCols,
    * _v double, _gr 0-based per-group rank, _n group size) — one plan,
    * one range exchange, one sort (cached; see GlobalRank's doc). */
  private case class Ranked(local: DataFrame, withRank: DataFrame)

  private def groupRanked(
      df: DataFrame, groupCols: Seq[String], valueCol: String): Ranked = {
    val gcols: Seq[Column] = groupCols.map(col)
    val v = df.select(gcols :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
    val lo = GlobalRank.localOffsets(v, gcols :+ col("_v"))
    val ranked = lo.local.join(broadcast(lo.offsets), "_gr_pid")
    // per-group first rank and size from ONE distributed aggregation
    // over the ranked rows: global ranks are unique and groups are
    // contiguous in the total order, so min(global rank) IS the
    // group's first rank. Partial aggregation combines map-side, so
    // only one row per (group, partition) — and groups are contiguous,
    // so at most groups + partitions − 1 rows — cross the wire. The
    // earlier prefix-window formulation funneled the whole group-sizes
    // table through ONE constant-key WindowExec task: fine for a few
    // event types, a single-task bottleneck for per-user groups.
    val grp =
      if (groupCols.isEmpty)
        lo.local.agg(count(lit(1)).as("_n")).withColumn("_first", lit(1L))
      else
        ranked.groupBy(gcols: _*).agg(count(lit(1)).as("_n"),
          min(col("_gr_lrn") + col("_gr_off")).as("_first"))
    // global case: grp is provably ONE row — broadcast it. Grouped
    // case: grp is one row PER GROUP, which callers may make huge
    // (per-user quantiles) — no forced broadcast; AQE picks BHJ when
    // the runtime size is small and a shuffle join when it is not.
    val withRank =
      (if (groupCols.isEmpty) ranked.crossJoin(broadcast(grp))
       else nullSafeJoin(ranked, grp, groupCols))
        .withColumn("_gr", col("_gr_lrn") + col("_gr_off") - col("_first"))
    Ranked(lo.local, withRank)
  }

  /** Quantile bounds per group from [[groupRanked]] rows, with the
    * rank-span integrity assert woven in (see object doc). `extras`
    * are additional (outName, aggregate-over-`_v`) columns that ride
    * the SAME grouped aggregate — callers that previously paid a
    * separate groupBy pass over the input for per-group moments
    * (count/mean/stddev) fold it into the pass the quantiles already
    * make (round-17, guide §2.4). Note the fold ORDER over `_v` is
    * the range-partitioned sorted order, not the scan order — exact
    * for counts, last-ulp-class for float moments, the tolerance
    * class every r6-rounded consumer already absorbs cross-engine. */
  private def boundsOf(withRank: DataFrame, groupCols: Seq[String],
      qs: Seq[(String, Double)],
      extras: Seq[(String, Column)] = Nil): DataFrame = {
    val gcols: Seq[Column] = groupCols.map(col)
    def pos(q: Double): Column = lit(q) * (col("_n") - 1).cast("double")
    val picks = qs.flatMap { case (name, q) =>
      Seq(
        max(when(col("_gr") === floor(pos(q)).cast("long"), col("_v"))).as(s"_${name}_lo"),
        max(when(col("_gr") === ceil(pos(q)).cast("long"), col("_v"))).as(s"_${name}_hi"))
    } ++ Seq(max(col("_n")).as("_n_out"), max(col("_gr")).as("_max_gr")) ++
      extras.map { case (name, c) => c.as(s"_x_$name") }
    val agged =
      if (groupCols.isEmpty) withRank.agg(picks.head, picks.tail: _*)
      else withRank.groupBy(gcols: _*).agg(picks.head, picks.tail: _*)
    // assert_true yields NULL on success; the filter keeps the check in
    // the executed plan (an unreferenced guard column would be pruned)
    val guarded = agged.filter(assert_true(col("_max_gr") === col("_n_out") - 1,
      lit("exact quantiles: per-group ranks do not tile 0..n-1 — the range " +
        "exchange executed with divergent layouts (is spark.sql.exchange.reuse " +
        "disabled?)")).isNull)
    val posOut = (q: Double) => lit(q) * (col("_n_out") - 1).cast("double")
    guarded.select(gcols ++ qs.map { case (name, q) =>
      (col(s"_${name}_lo") +
        (col(s"_${name}_hi") - col(s"_${name}_lo")) *
          (posOut(q) - floor(posOut(q)))).as(name)
    } ++ extras.map { case (name, _) => col(s"_x_$name").as(name) }: _*)
  }

  /** One row per group: `groupCols ++ qs.map(_._1) ++ extras names`
    * with each named column holding the exact q-quantile of
    * `valueCol` (and each extra its aggregate over the group's `_v`
    * rows — see [[boundsOf]]). `groupCols` empty ⇒ a single global
    * row. */
  def exactQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Double)],
      extras: Seq[(String, Column)] = Nil): DataFrame =
    boundsOf(groupRanked(df, groupCols, valueCol).withRank, groupCols, qs,
      extras)

  /** Every (non-null-value) input row, annotated with its group's exact
    * quantiles: `groupCols :+ valueCol :+ qs names`. The winsorize /
    * clip-to-band shape: downstream clips and re-aggregates WITHOUT
    * re-scanning the table — rows and bounds both hang off the same
    * range exchange, so the whole pipeline reads the source once. The
    * bounds table is one row per group and broadcast back onto the
    * rows. */
  def withQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    val gcols: Seq[Column] = groupCols.map(col)
    val gr = groupRanked(df, groupCols, valueCol)
    val bounds = boundsOf(gr.withRank, groupCols, qs)
    // the row side needs no ranks — read the cached sorted table
    // directly, skipping the offsets/group joins entirely
    val rows = gr.local.select(gcols :+ col("_v").as(valueCol): _*)
    if (groupCols.isEmpty) rows.crossJoin(broadcast(bounds))
    else nullSafeJoin(rows, bounds, groupCols, broadcastRight = true)
  }

  /** Equi-depth (equal-frequency) binning: every row labeled with its
    * group's exact NTILE(k) bucket over `valueCol`, aggregated to one
    * row per (group, bin) with count/lo/hi/mean — the feature-binning
    * and drift-histogram shape where equal-WIDTH buckets (q116) would
    * put 99% of a skewed column in one bar. Runs on the same
    * single-scan rank machinery; the bucket is the SQL NTILE closed
    * form (first n mod k buckets hold ceil(n/k) rows), so the result
    * is engine-exact. Ties in `valueCol` may split across adjacent
    * bins differently per engine, but swapping EQUAL values between
    * bins changes no aggregate — the output is tie-stable. */
  def equiDepthBins(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int): DataFrame = {
    val gcols: Seq[Column] = groupCols.map(col)
    val rn = col("_gr") + 1
    val base = expr(s"_n div $k"); val rem = col("_n") % k
    val bigSpan = rem * (base + lit(1L))
    val bin = (when(rn <= bigSpan,
        floor((rn - 1).cast("double") / (base + lit(1L)).cast("double")))
      .otherwise(rem +
        floor((rn - bigSpan - 1).cast("double") / base.cast("double")))
      .cast("long") + 1).as("bin")
    groupRanked(df, groupCols, valueCol).withRank
      .select(gcols ++ Seq(bin, col("_v")): _*)
      .groupBy(gcols :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"), min(col("_v")).as("lo"),
        max(col("_v")).as("hi"), avg(col("_v")).as("mean"))
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
    * threshold crossing float-order-dependent and engine-divergent)
    * and NON-NEGATIVE — a negative weight breaks the monotonicity of
    * the running weight and would silently mis-pick the threshold
    * crossing, so it raises instead (same fail-loud stance as the
    * 2^33 partition-size check). NULL group keys are retained
    * (null-safe joins), matching groupBy semantics. */
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
      .withColumn("_w", when(col("_w") < 0, raise_error(concat(
        lit("weighted quantiles: negative weight "), col("_w").cast("string"),
        lit(" — running cumulative weight must be monotone"))))
        .otherwise(col("_w")))
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
    // the prefix window below runs over THIS table, not the data.
    // No groups ⇒ partition by a non-foldable constant key:
    // single-partition by design over the tiny table, without
    // WindowExec's no-partition warning burying real log anomalies
    // (lit(0) would be stripped by EliminateWindowPartitions — see
    // GlobalRank.constKey).
    val pg = local.groupBy(col("_pid") +: gcols: _*).agg(max(col("_lcw")).as("_pgw"))
    val wOff = (if (groupCols.isEmpty) Window.partitionBy(GlobalRank.constKey(col("_pid")))
                else Window.partitionBy(gcols: _*))
      .orderBy(col("_pid"))
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
    } :+ max(col("_cw")).as("_max_cw") :+ max(col("_tw")).as("_tw_out")
    val agged =
      if (groupCols.isEmpty) withTotal.agg(picks.head, picks.tail: _*)
      else withTotal.groupBy(gcols: _*).agg(picks.head, picks.tail: _*)
    // same integrity stance as boundsOf: the final cumulative weight of
    // each group must equal the group's total weight, or the offsets
    // branch and the data branch saw different exchange layouts
    agged.filter(assert_true(col("_max_cw") === col("_tw_out"),
      lit("weighted quantiles: cumulative weights do not reach the group total " +
        "— the range exchange executed with divergent layouts")).isNull)
      .drop("_max_cw", "_tw_out")
  }
}
