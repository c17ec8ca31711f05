package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate-state maintenance: keep a per-key state table
  * of mergeable moments (n, sum, min, max, M2) and fold new batches in
  * WITHOUT rescanning history — the aggregation analogue of the SCD1
  * upsert (q84) and SCD2 merge (q124). At 100 TB this is how daily
  * stats stay current: the corpus is aggregated once, every later
  * batch merges in O(batch + keys).
  *
  * M2 = Σ(x − mean)² merges by Chan's parallel update
  * (M2 = M2a + M2b + Δ²·na·nb/n, Δ = meanb − meana) — the same
  * formula Spark's own Welford-based variance aggregates use to merge
  * partition partials, applied here across TIME instead of across
  * partitions. Merging is exact for n/sum/min/max and
  * floating-point-stable for M2 (no catastrophic cancellation: Δ is a
  * difference of means, not of large sums). */
object IncrementalAgg {

  /** Per-key state from a batch of raw rows. */
  def state(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.filter(v.isNotNull).groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"), sum(v).as("sum"),
      min(v).as("min"), max(v).as("max"),
      (var_pop(v) * count(lit(1))).as("m2"))
  }

  /** Merge two state tables (full-outer on the key; a key on one side
    * only passes through). One keyed shuffle of two KEY-sized tables —
    * raw history is never touched. */
  def merge(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val bb = Seq("n", "sum", "min", "max", "m2")
      .foldLeft(b.withColumnRenamed(keyCol, "_bk"))((df, c) =>
        df.withColumnRenamed(c, s"_b$c"))
    def both(f: => Column, aOnly: Column, bOnly: Column): Column =
      when(col("n").isNull, bOnly).when(col("_bn").isNull, aOnly).otherwise(f)
    a.join(bb, col(keyCol) <=> col("_bk"), "full_outer")
      .select(
        coalesce(col(keyCol), col("_bk")).as(keyCol),
        both(col("n") + col("_bn"), col("n"), col("_bn")).as("n_out"),
        both(col("sum") + col("_bsum"), col("sum"), col("_bsum")).as("sum_out"),
        both(least(col("min"), col("_bmin")), col("min"), col("_bmin")).as("min_out"),
        both(greatest(col("max"), col("_bmax")), col("max"), col("_bmax")).as("max_out"),
        both(
          col("m2") + col("_bm2") +
            pow(col("_bsum") / col("_bn") - col("sum") / col("n"), 2) *
              col("n") * col("_bn") / (col("n") + col("_bn")),
          col("m2"), col("_bm2")).as("m2_out"))
      .withColumnsRenamed(Map("n_out" -> "n", "sum_out" -> "sum",
        "min_out" -> "min", "max_out" -> "max", "m2_out" -> "m2"))
  }
}
