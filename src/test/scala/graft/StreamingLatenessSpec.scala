package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Watermark-sizing contract, end to end — the q373 planner's number
  * plugged into a REAL stream: events are fed in the SAME
  * deterministic content-hash arrival permutation q373 replays
  * (four sha-quartile files, one micro-batch each, so event time is
  * shuffled across batches), and the tumbling aggregation runs at
  * three watermark delays:
  *
  *  - a delay ≥ the measured worst-case global lateness (computed
  *    the q373 way: running event-time high-watermark over the
  *    arrival order) drops NOTHING and converges to the batch twin's
  *    exact per-window counts — the planner's sizing is sufficient;
  *  - a 1-second delay visibly drops (numRowsDroppedByWatermark > 0)
  *    — the metric a too-tight production watermark shows.
  *
  * Sufficiency argument pinned by the first case: the stream's
  * watermark after batch b is max-ts-seen − delay, which is ≤ any
  * row's running global high-watermark − delay; with delay ≥
  * max(hw − ts) every row's timestamp clears the watermark, so no
  * window closes early. Batch-boundary granularity only makes the
  * stream MORE permissive than the per-row bound.
  */
class StreamingLatenessSpec extends SparkSuite {

  private var seq = 0

  /** Feed the permuted quartile files as 4 micro-batches at `delay`;
    * return (total dropped-by-watermark, final per-key counts). */
  private def run(delay: String): (Long, org.apache.spark.sql.DataFrame) = {
    import java.nio.file.Files
    seq += 1
    val srcDir = Files.createTempDirectory(s"graft_late$seq").toString
    val ev = Tables(spark, sf, "events")
      .withColumn("arr", substring(
        sha2(col("event_id").cast("string"), 256), 1, 1))
    Seq(("0", "3"), ("4", "7"), ("8", "b"), ("c", "f")).zipWithIndex
      .foreach { case ((lo, hi), i) =>
        ev.filter(col("arr").between(lo, hi)).drop("arr")
          .coalesce(1).write.parquet(s"$srcDir/g$i")
        // EXPLICIT spaced mtimes fix the file-source batch order: on a
        // 1-second-granularity filesystem a sleep can still leave two
        // quartiles sharing a timestamp, coalescing/reordering batches
        val ft = java.nio.file.attribute.FileTime
          .fromMillis(1700000000000L + i * 10000L)
        val walk = Files.walk(java.nio.file.Paths.get(s"$srcDir/g$i"))
        try walk.forEach(p => Files.setLastModifiedTime(p, ft))
        finally walk.close()
      }
    val tbl = s"late_counts_$seq"
    val src = spark.readStream
      .schema(Tables(spark, sf, "events").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/g*")
    val q = streaming.EventStreams.tumblingCountsDelay(src, delay)
      .writeStream.outputMode("update").format("memory").queryName(tbl)
      .start()
    q.processAllAvailable()
    val drops = q.recentProgress
      .flatMap(p => p.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    q.stop()
    // update mode emits a row per key per batch it changed in; counts
    // are monotone per key, so the final value is the max
    (drops, spark.table(tbl).groupBy(col("w_start"), col("event_type"))
      .agg(max(col("n")).as("n")))
  }

  test("a planner-sized watermark loses nothing vs the batch twin") {
    // worst-case global lateness over the SAME arrival permutation,
    // computed the q373 way (running high-watermark minus event time)
    val w = Window.orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundUs = Tables(spark, sf, "events")
      .select(unix_micros(col("ts")).as("us"),
        sha2(col("event_id").cast("string"), 256).as("arr"), col("event_id"))
      .withColumn("hw", max(col("us")).over(w))
      .agg(max(when(col("hw") > col("us"), col("hw") - col("us"))
        .otherwise(lit(0L))))
      .head.getLong(0)
    val delaySec = boundUs / 1000000L + 2
    val (drops, got) = run(s"$delaySec seconds")
    assert(drops == 0L, s"planner-sized watermark still dropped $drops rows")
    val want = Tables(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val bad = got.withColumnRenamed("n", "ns")
      .join(want, Seq("w_start", "event_type"), "full_outer")
      .filter(coalesce(col("ns"), lit(-1L)) =!= coalesce(col("n"), lit(-2L)))
      .count()
    assert(bad == 0L,
      s"stream at the planner-sized watermark diverged from batch on $bad windows")
  }

  test("a too-tight watermark visibly drops late rows") {
    val (drops, _) = run("1 second")
    assert(drops > 0L,
      "1-second watermark dropped nothing under the arrival permutation " +
        "— the lateness the q373 planner measures is not reaching the stream")
  }
}
