package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Streaming specs: each windowed streaming query must converge to its
  * batch twin's result when fed the full events directory (batch-
  * equivalence is the correctness oracle for streaming operators). */
class StreamingSpec extends SparkSuite {

  // readStream sources must be directories; stage the single testdata
  // parquet file into one (the batch side writes real directories)
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-000.parquet"))
    dir.toString
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming tumbling counts converge to the batch time-bucket result") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    runToMemory(EventStreams.tumblingCounts(stream), "tumbling", "append")
    // append mode with watermark emits only windows the watermark has
    // passed; processAllAvailable on a static dir finalizes all but the
    // last open window(s). Compare on the emitted subset.
    val streamed = spark.table("tumbling")
      .groupBy("w_start").agg(sum("n").as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val batch = Tables(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (w, n) =>
      assert(batch.get(w).contains(n), s"window $w: streamed $n vs batch ${batch.get(w)}")
    }
  }

  test("streaming session windows match batch sessionization boundaries") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    runToMemory(EventStreams.sessionCounts(stream), "sessions", "append")
    val streamed = spark.table("sessions")
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    assert(streamed.nonEmpty)
    // batch twin: q31_sessionize (30-min gap sessions)
    val batch = ops.Profiling.queries("q31_sessionize")(spark, sf)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // every finalized streaming session must be a batch session
    val missing = streamed.filterNot(batch.contains)
    assert(missing.isEmpty, s"sessions not in batch result: ${missing.take(5).toSeq}")
  }

  test("stateful flatMapGroupsWithState sessionization equals batch sessions") {
    import spark.implicits._
    val events = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    // run the stateful operator in one batch-like pass (single group call)
    val sessions = EventStreams.statefulSessionize(spark, events)
    // closed sessions only (the last session per user stays open in state):
    val stateful = sessions.collect()
      .map(s => (s.user_id, s.session_start, s.n_events)).toSet
    val batch = ops.Profiling.queries("q31_sessionize")(spark, sf)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(stateful.nonEmpty)
    val missing = stateful.diff(batch)
    assert(missing.isEmpty, s"stateful sessions not in batch: ${missing.take(5)}")
  }
}
