package graft.streaming

import org.apache.spark.sql.functions.col

/** Runnable streaming demo: feeds the events testdata through a real
  * StreamingQuery (tumbling + session windows) into an in-memory sink
  * and prints the leading windows.
  *
  * Usage: sbt "runMain graft.streaming.StreamDemoMain [sfDir]"
  */
object StreamDemoMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local("graft-stream-demo")

    val events = EventStreams.readEvents(spark,
      EventStreams.stageAsDirectory(s"$sfDir/events.parquet"))

    val tq = EventStreams.tumblingCounts(events).writeStream
      .outputMode("append").format("memory").queryName("tumbling").start()
    tq.processAllAvailable(); tq.stop()
    println("tumbling windows (first 5):")
    spark.table("tumbling").orderBy("w_start", "event_type").show(5, truncate = false)

    val sq = EventStreams.sessionCounts(events).writeStream
      .outputMode("append").format("memory").queryName("sessions").start()
    sq.processAllAvailable(); sq.stop()
    println(s"closed sessions: ${spark.table("sessions").count()}")
    spark.table("sessions").orderBy("user_id", "session_start").show(5, truncate = false)

    import spark.implicits._
    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val dq = EventStreams.dqTrend(spark, typed, threshold = 0.2, minSeen = 10)
      .writeStream.outputMode("append").format("memory").queryName("dq_alerts").start()
    dq.processAllAvailable(); dq.stop()
    println(s"dq alerts: ${spark.table("dq_alerts").count()}")
    spark.table("dq_alerts").orderBy("user_id").show(5, truncate = false)

    spark.stop()
  }
}
