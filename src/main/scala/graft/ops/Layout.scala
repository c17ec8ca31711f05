package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Data-layout operators: Z-order (Morton) clustering keys.
  *
  * At 100 TB, scan cost is dominated by how much data a filter can
  * SKIP. Sorting files by one column gives perfect min/max pruning on
  * that column and none on any other; interleaving the bits of several
  * columns (the Z-order curve — what Delta/Iceberg OPTIMIZE ZORDER
  * computes) gives every interleaved dimension partial locality, so
  * per-file min/max statistics prune multi-dimensional box queries.
  * The key is plain bit arithmetic — shifts, masks, ors — entirely
  * inside whole-stage codegen, and the layout step is one
  * repartitionByRange(zkey) write: no new operator, just a better sort
  * key for the exchange Spark already does. */
object Layout {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i — the
    * classic mask-and-shift doubling chain (each step is exact integer
    * arithmetic, identical in any engine). */
  private def spread16(c: Column): Column = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val s = Seq(8, 4, 2, 1)
    m.zip(s).foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (mask, sh)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }
  }

  /** 32-bit Morton key of two 16-bit dimensions: a's bits at even
    * positions, b's at odd. */
  def zorder2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** events with their two layout dimensions (16-bit buckets of
    * user_id and milli-scaled value) and the interleaved key. */
  def eventZkeys(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"),
        pmod(col("user_id"), lit(65536L)).as("da"),
        pmod(floor(col("value") * 1000).cast("long"), lit(65536L)).as("db"))
      .withColumn("zkey", zorder2(col("da"), col("db")))

  val queries: Map[String, Q] = Map(
    /** Z-order clustering keys over events, the layout step being
      * repartitionByRange(zkey) at write time. Every bit of the key is
      * oracle-checked: DuckDB replicates the mask-and-shift chain, so
      * any interleave mistake flips keys and fails the hash compare. */
    "q109_zorder_key" -> ((s: SparkSession, dir: String) => {
      eventZkeys(s, dir)
        .select(col("event_id"), col("da"), col("db"), col("zkey"))
        .orderBy(col("zkey"), col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q109_zorder_key" ->
      """WITH base AS (
        |  SELECT event_id,
        |  ((user_id % 65536) + 65536) % 65536 AS da,
        |  ((CAST(floor(value * 1000) AS BIGINT) % 65536) + 65536) % 65536 AS db
        |  FROM events),
        |s1 AS (SELECT event_id, da, db,
        |  (da | (da << 8)) & 16711935 AS xa, (db | (db << 8)) & 16711935 AS xb FROM base),
        |s2 AS (SELECT event_id, da, db,
        |  (xa | (xa << 4)) & 252645135 AS xa, (xb | (xb << 4)) & 252645135 AS xb FROM s1),
        |s3 AS (SELECT event_id, da, db,
        |  (xa | (xa << 2)) & 858993459 AS xa, (xb | (xb << 2)) & 858993459 AS xb FROM s2),
        |s4 AS (SELECT event_id, da, db,
        |  (xa | (xa << 1)) & 1431655765 AS xa, (xb | (xb << 1)) & 1431655765 AS xb FROM s3)
        |SELECT event_id, da, db, xa | (xb << 1) AS zkey
        |FROM s4
        |ORDER BY zkey NULLS FIRST, event_id NULLS FIRST""".stripMargin
  )
}
