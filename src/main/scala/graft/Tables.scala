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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark reads as a long
    // only under spark.sql.legacy.parquet.nanosAsLong=true (set in
    // Verify/Bench/test sessions). All values are whole microseconds, so
    // integer-dividing to micros is lossless; `div` keeps 64-bit integer
    // arithmetic (a double roundtrip would lose precision above 2^53 ns).
    df.schema.fields.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }
}
