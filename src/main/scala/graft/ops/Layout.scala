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
    }),

    /** Shuffle-PARTITION planner — the sizing table behind every
      * `spark.sql.shuffle.partitions` / `maxPartitionBytes` choice:
      * per table, the row count, a DETERMINISTIC logical byte estimate
      * (8 B per numeric/temporal column + actual string lengths — a
      * data property both engines compute identically, unlike file
      * sizes, which depend on encoder settings), and the partition
      * count that keeps partitions at the 256 MiB operating point at
      * today's size, 100× and 1000× — the table one reads to see WHEN
      * a fixed partition count stops being safe (the fixed-32 local
      * config saturates exactly this way; see ScaleStress). Four
      * 1-row aggregates + a literal scale generator; ceil is exact
      * integer arithmetic. */
    "q372_partition_planner" -> ((s: SparkSession, dir: String) => {
      def one(name: String, tbl: DataFrame, rowBytes: Column) =
        tbl.agg(count(lit(1)).as("n_rows"),
            sum(rowBytes.cast("long")).as("est_bytes"))
          .select(lit(name).as("table_name"), col("n_rows"), col("est_bytes"))
      val li = one("lineitem", Tables(s, dir, "lineitem"),
        lit(8L * 8 + 4) + length(col("l_returnflag")) + length(col("l_linestatus")))
      val or = one("orders", Tables(s, dir, "orders"),
        lit(8L * 3 + 4) + length(col("o_orderstatus")) + length(col("o_orderpriority")))
      val ev = one("events", Tables(s, dir, "events"),
        lit(8L * 4) + length(col("event_type")) +
          coalesce(length(col("props")), lit(0)))
      val dc = one("documents", Tables(s, dir, "documents"),
        lit(8L * 2) + coalesce(length(col("text")), lit(0)) +
          length(col("lang")) + length(col("source")))
      li.unionAll(or).unionAll(ev).unionAll(dc)
        .select(col("table_name"), col("n_rows"), col("est_bytes"),
          explode(expr("array(1L, 100L, 1000L)")).as("scale"))
        .select(col("table_name"), col("scale"), col("n_rows"),
          col("est_bytes"),
          greatest(lit(1L), expr(
            "(est_bytes * scale + 268435455) DIV 268435456"))
            .as("parts_256mb"))
        .orderBy(col("table_name"), col("scale"))
    }),

    /** Broadcast-JOIN planner — q372's sizing arithmetic pointed at
      * the JOIN STRATEGY decision: per dimension table and corpus
      * scale {1, 100, 1000}, the logical byte estimate vs the 10 MiB
      * autoBroadcastJoinThreshold, and the strategy a planner should
      * force (broadcast / shuffle) — the table that says WHICH star
      * joins survive a 100× scale-up as map-side joins (region/nation
      * always; supplier/customer flip at some scale; the fact tables
      * never). Five 1-row aggregates + the literal scale grid. */
    "q374_broadcast_planner" -> ((s: SparkSession, dir: String) => {
      def one(name: String, tbl: DataFrame, rowBytes: Column) =
        tbl.agg(count(lit(1)).as("n_rows"),
            sum(rowBytes.cast("long")).as("est_bytes"))
          .select(lit(name).as("table_name"), col("n_rows"), col("est_bytes"))
      val rg = one("region", Tables(s, dir, "region"),
        lit(8L) + length(col("r_name")))
      val na = one("nation", Tables(s, dir, "nation"),
        lit(8L * 2) + length(col("n_name")))
      val su = one("supplier", Tables(s, dir, "supplier"),
        lit(8L * 3) + length(col("s_name")))
      val cu = one("customer", Tables(s, dir, "customer"),
        lit(8L * 3) + length(col("c_name")) + length(col("c_mktsegment")))
      val pa = one("part", Tables(s, dir, "part"),
        lit(8L * 3) + length(col("p_name")) + length(col("p_brand")) +
          length(col("p_type")))
      rg.unionAll(na).unionAll(su).unionAll(cu).unionAll(pa)
        .select(col("table_name"), col("n_rows"), col("est_bytes"),
          explode(expr("array(1L, 100L, 1000L)")).as("scale"))
        .select(col("table_name"), col("scale"), col("n_rows"),
          (col("est_bytes") * col("scale")).as("scaled_bytes"),
          when(col("est_bytes") * col("scale") <= 10485760L, "broadcast")
            .otherwise("shuffle").as("strategy"))
        .orderBy(col("table_name"), col("scale"))
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
        |ORDER BY zkey NULLS FIRST, event_id NULLS FIRST""".stripMargin,

    // the same per-table logical byte widths, integer ceil at the
    // 256 MiB operating point over the {1,100,1000} scale grid
    "q372_partition_planner" ->
      """WITH b AS (
        |  SELECT 'lineitem' AS table_name, count(*) AS n_rows,
        |  sum(8*8 + 4 + length(l_returnflag) + length(l_linestatus))
        |    AS est_bytes FROM lineitem
        |  UNION ALL
        |  SELECT 'orders', count(*),
        |  sum(8*3 + 4 + length(o_orderstatus) + length(o_orderpriority))
        |  FROM orders
        |  UNION ALL
        |  SELECT 'events', count(*),
        |  sum(8*4 + length(event_type) + coalesce(length(props), 0))
        |  FROM events
        |  UNION ALL
        |  SELECT 'documents', count(*),
        |  sum(8*2 + coalesce(length(text), 0) + length(lang) + length(source))
        |  FROM documents)
        |SELECT table_name, CAST(s.scale AS BIGINT) AS scale,
        |CAST(n_rows AS BIGINT) AS n_rows,
        |CAST(est_bytes AS BIGINT) AS est_bytes,
        |CAST(greatest(1, (est_bytes * s.scale + 268435455) // 268435456)
        |  AS BIGINT) AS parts_256mb
        |FROM b, (SELECT unnest([1, 100, 1000]) AS scale) s
        |ORDER BY table_name NULLS FIRST, scale NULLS FIRST""".stripMargin,

    // the same per-dim logical widths vs the 10 MiB broadcast
    // threshold over the {1,100,1000} grid
    "q374_broadcast_planner" ->
      """WITH b AS (
        |  SELECT 'region' AS table_name, count(*) AS n_rows,
        |  sum(8 + length(r_name)) AS est_bytes FROM region
        |  UNION ALL SELECT 'nation', count(*),
        |  sum(8*2 + length(n_name)) FROM nation
        |  UNION ALL SELECT 'supplier', count(*),
        |  sum(8*3 + length(s_name)) FROM supplier
        |  UNION ALL SELECT 'customer', count(*),
        |  sum(8*3 + length(c_name) + length(c_mktsegment)) FROM customer
        |  UNION ALL SELECT 'part', count(*),
        |  sum(8*3 + length(p_name) + length(p_brand) + length(p_type))
        |  FROM part)
        |SELECT table_name, CAST(s.scale AS BIGINT) AS scale,
        |CAST(n_rows AS BIGINT) AS n_rows,
        |CAST(est_bytes * s.scale AS BIGINT) AS scaled_bytes,
        |CASE WHEN est_bytes * s.scale <= 10485760 THEN 'broadcast'
        |  ELSE 'shuffle' END AS strategy
        |FROM b, (SELECT unnest([1, 100, 1000]) AS scale) s
        |ORDER BY table_name NULLS FIRST, scale NULLS FIRST""".stripMargin
  )
}
