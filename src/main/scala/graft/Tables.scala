package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over a testdata scale-factor dir (TESTDATA.md).
  *
  * All tables are columnar parquet; Spark's vectorized reader + Catalyst
  * column pruning / predicate pushdown apply automatically. At cluster
  * scale these would be partitioned directories — the reader API is
  * identical, so every query below survives the 100 TB scale-up
  * unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // memoized per (session, dir, table): `spark.read.parquet` builds a
  // fresh InMemoryFileIndex (directory listing + footer reads) on every
  // call — measurable per-query overhead in a 99-query sweep, and at
  // cluster scale a listing of a large partitioned table is an RPC
  // storm worth doing once. The testdata files are immutable, and the
  // cached object is only the analyzed relation (no data pinned), so
  // catalog.clearCache() semantics are unaffected.
  // KNOWN TRADE-OFF (deliberate for the bench harness): entries are
  // never evicted, so a stopped session's DataFrames are retained for
  // the JVM lifetime and a rewritten fixture dir would be served stale
  // within a process. Long-lived multi-session services should key on
  // a weak session reference or clear entries from a session-stop
  // listener.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.computeIfAbsent((spark, dir, name),
      _ => load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Older testdata stored events.ts as parquet TIMESTAMP(NANOS), which
    // Spark reads as a long only under
    // spark.sql.legacy.parquet.nanosAsLong=true (set in Verify/Bench/test
    // sessions); current fixtures ship tz-less micros, which
    // inferTimestampNTZ=false (GraftSession) reads directly as TIMESTAMP.
    // Keep the long branch so both fixture vintages load: all values are
    // whole microseconds, so integer-dividing is lossless; `div` keeps
    // 64-bit integer arithmetic (a double roundtrip would lose precision
    // above 2^53 ns).
    df.schema.fields.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }
}
