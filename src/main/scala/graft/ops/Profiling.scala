package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables, r2, r4, r6, r2n, r4n, r6n}

/** The reference's data-quality / profiling / drift semantics
  * (SURVEY.md §2.4 A1-A12, §2.10) re-expressed as single-pass Spark
  * aggregations, plus batch sessionization (the batch twin of the
  * streaming session-window operator in graft.streaming).
  *
  * The reference computes every statistic in a per-column Python loop
  * (N passes for N columns, `data_quality_checks.py:41-49`,
  * `drift_detector.py:16-26`); here each profile is ONE fused
  * `agg(...)` — one scan, one partial+final HashAggregate, no shuffle
  * beyond the single-row reduce. That is the shape that survives 100 TB.
  */
object Profiling {


  val queries: Map[String, Q] = Map(

    /** DQ null-profile (reference A1+A2, `data_quality_checks.py:27-49`):
      * row count + per-column null fraction in one pass. Flagship query. */
    "q28_dq_null_profile" -> ((s: SparkSession, dir: String) => {
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      Tables(s, dir, "customer").agg(
        count(lit(1)).as("row_count"),
        cols.map(c => r6n(avg(col(c).isNull.cast("double"))).as(s"nf_$c")): _*)
    }),

    /** Statistical profile (reference A6/A7/A12, `drift_detector.py:16-26`):
      * mean + sample std per numeric column, fused into one agg and
      * reshaped to long format. stddev_samp(n=1) is null in Spark but 0.0
      * in the reference — coalesce matches it (SURVEY.md §7.4.2). */
    "q29_profile_stats" -> ((s: SparkSession, dir: String) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggd = Tables(s, dir, "lineitem").agg(
        r4(avg(col(cols.head))).as(s"m_${cols.head}"),
        cols.tail.map(c => r4(avg(col(c))).as(s"m_$c")) ++
        cols.map(c => r4(coalesce(stddev_samp(col(c)), lit(0.0))).as(s"s_$c")) ++
        cols.map(c => count(col(c)).as(s"n_$c")): _*)
      aggd.select(explode(array(cols.map(c =>
          struct(lit(c).as("column_name"), col(s"m_$c").as("mean"),
            col(s"s_$c").as("std"), col(s"n_$c").as("n_nonnull"))): _*)).as("p"))
        .select(col("p.column_name"), col("p.mean"), col("p.std"), col("p.n_nonnull"))
        .orderBy(col("column_name"))
    }),

    /** Drift comparison (reference `drift_detector.py:57-80`): baseline
      * profile vs current profile joined on column name; relative mean
      * change vs tolerance (F5-F7). Baseline = even order keys, current =
      * odd — two branches of one cached scan. */
    "q30_drift_compare" -> ((s: SparkSession, dir: String) => {
      val o = Tables(s, dir, "orders")
      def profile(parity: Int, side: String): DataFrame =
        o.filter(pmod(col("o_orderkey"), lit(2)) === parity)
          .agg(avg(col("o_totalprice")).as(s"${side}_mean_price"),
            count(lit(1)).cast("double").as(s"${side}_n"))
      val base = profile(0, "base")
      val curr = profile(1, "curr")
      base.crossJoin(curr)
        .select(
          lit("o_totalprice").as("column_name"),
          r4(col("base_mean_price")).as("base_mean"),
          r4(col("curr_mean_price")).as("curr_mean"),
          r6(abs(col("curr_mean_price") - col("base_mean_price")) /
            abs(col("base_mean_price"))).as("rel_change"),
          (abs(col("curr_mean_price") - col("base_mean_price")) /
            abs(col("base_mean_price")) > lit(0.5)).as("drifted"))
    }),

    /** Batch sessionization: 30-minute-gap sessions per user via a
      * lag + running-sum window — one shuffle on user_id. Streaming twin:
      * session_window / flatMapGroupsWithState in graft.streaming. */
    "q31_sessionize" -> ((s: SparkSession, dir: String) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // >= matches session_window semantics (windows are [start,
      // last+gap), so an event at exactly last+gap opens a new session)
      val newSession = when(lag(col("ts"), 1).over(byUser).isNull ||
          (col("ts").cast("double") - lag(col("ts"), 1).over(byUser).cast("double")) >= 1800.0, 1L)
        .otherwise(0L)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          newSession.as("new_s"))
        .select(col("user_id"), col("ts"), col("value"),
          sum(col("new_s")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("session_seq"))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("user_id"), col("session_seq"))
    }),

    /** Approximate functional-dependency audit — "does column A
      * determine column B?" measured as a violation RATE (rows
      * outside their key's dominant B value), the data-profiling
      * step that discovers the de-facto constraints a contract
      * (reference `pipeline_config.yml`) should declare, and catches
      * their erosion before a join or healing rule silently relies
      * on one. Five candidate FDs across three tables; each is two
      * map-side-combined aggregates — (A, B) counts, then the
      * per-key max folded against the key total — shuffles keyed on
      * A, post-shuffle bounded by the key domain, never a row-level
      * comparison. Exact integers until the nudged rate. */
    "q262_fd_audit" -> ((s: SparkSession, dir: String) => {
      def audit(table: String, a: String, b: String) = {
        val ab = Tables(s, dir, table)
          .groupBy(col(a).as("k"), col(b).as("v"))
          .agg(count(lit(1)).as("c"))
        ab.groupBy(col("k"))
          .agg(sum(col("c")).as("nk"), max(col("c")).as("mx"))
          .agg(sum(col("nk")).as("n_rows"), count(lit(1)).as("n_keys"),
            sum(col("nk") - col("mx")).as("violations"))
          .select(lit(table).as("table_name"), lit(a).as("lhs"),
            lit(b).as("rhs"), col("n_rows"), col("n_keys"),
            col("violations"),
            r6n(col("violations").cast("double") / col("n_rows"))
              .as("violation_rate"))
      }
      audit("part", "p_brand", "p_type")
        .unionByName(audit("part", "p_type", "p_brand"))
        .unionByName(audit("orders", "o_custkey", "o_orderpriority"))
        .unionByName(audit("lineitem", "l_partkey", "l_suppkey"))
        .unionByName(audit("lineitem", "l_orderkey", "l_returnflag"))
        .orderBy(col("table_name"), col("lhs"), col("rhs"))
    }),

    /** Watermark PLANNER — the lateness census behind every
      * `withWatermark` threshold (EventStreams): per event type, how
      * many events arrive behind their user's event-time
      * high-watermark, and by how much — too tight a watermark drops
      * them, too loose bloats every stateful operator. The fixture
      * ships no arrival column (its ts is ingest-monotone, lateness
      * identically 0), so arrival order is REPLAYED under a
      * deterministic content-hash permutation (sha-256 of event_id —
      * the q95 synthetic-input stance): a worst-case full reorder
      * both engines reconstruct bit-identically. The high-watermark
      * is a per-USER running max (data-cardinality partition, the
      * q31 sessionize class); delays are exact integer microseconds
      * until the two nudged output ratios. */
    "q373_watermark_planner" -> ((s: SparkSession, dir: String) => {
      val arrival = Window.partitionBy(col("user_id"))
        .orderBy(col("arr"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, dir, "events")
        .select(col("event_type"), col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          sha2(col("event_id").cast("string"), 256).as("arr"))
        .withColumn("hw", max(col("us")).over(arrival))
        .select(col("event_type"),
          (col("hw").isNotNull && col("us") < col("hw")).as("late"),
          when(col("hw").isNotNull && col("us") < col("hw"),
            col("hw") - col("us")).otherwise(lit(0L)).as("delay_us"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count_if(col("late")).as("n_late"),
          r6n(count_if(col("late")).cast("double") / count(lit(1)))
            .as("late_share"),
          r6n(when(count_if(col("late")) > 0,
            sum(col("delay_us")).cast("double") /
              (count_if(col("late")).cast("double") * 1e6))
            .otherwise(lit(0.0))).as("avg_late_delay_s"),
          max(col("delay_us")).as("max_delay_us"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q28_dq_null_profile" ->
      """SELECT count(*) AS row_count,
        |round(avg(CASE WHEN c_custkey IS NULL THEN 1.0 ELSE 0.0 END) + 1e-12,6) AS nf_c_custkey,
        |round(avg(CASE WHEN c_name IS NULL THEN 1.0 ELSE 0.0 END) + 1e-12,6) AS nf_c_name,
        |round(avg(CASE WHEN c_nationkey IS NULL THEN 1.0 ELSE 0.0 END) + 1e-12,6) AS nf_c_nationkey,
        |round(avg(CASE WHEN c_acctbal IS NULL THEN 1.0 ELSE 0.0 END) + 1e-12,6) AS nf_c_acctbal,
        |round(avg(CASE WHEN c_mktsegment IS NULL THEN 1.0 ELSE 0.0 END) + 1e-12,6) AS nf_c_mktsegment
        |FROM customer""".stripMargin,

    "q29_profile_stats" ->
      """SELECT 'l_quantity' AS column_name, round(avg(l_quantity),4) AS mean,
        |round(coalesce(stddev_samp(l_quantity),0),4) AS std, count(l_quantity) AS n_nonnull FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', round(avg(l_extendedprice),4),
        |round(coalesce(stddev_samp(l_extendedprice),0),4), count(l_extendedprice) FROM lineitem
        |UNION ALL SELECT 'l_discount', round(avg(l_discount),4),
        |round(coalesce(stddev_samp(l_discount),0),4), count(l_discount) FROM lineitem
        |UNION ALL SELECT 'l_tax', round(avg(l_tax),4),
        |round(coalesce(stddev_samp(l_tax),0),4), count(l_tax) FROM lineitem
        |ORDER BY column_name NULLS FIRST""".stripMargin,

    "q30_drift_compare" ->
      """WITH base AS (
        |  SELECT avg(o_totalprice) AS m FROM orders WHERE o_orderkey % 2 = 0),
        |curr AS (
        |  SELECT avg(o_totalprice) AS m FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT 'o_totalprice' AS column_name,
        |round(base.m,4) AS base_mean, round(curr.m,4) AS curr_mean,
        |round(abs(curr.m - base.m)/abs(base.m),6) AS rel_change,
        |abs(curr.m - base.m)/abs(base.m) > 0.5 AS drifted
        |FROM base, curr""".stripMargin,

    "q31_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |  cast(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |cast(min(ts) AS TIMESTAMP) AS session_start,
        |cast(max(ts) AS TIMESTAMP) AS session_end, round(sum(value),2) AS sum_value
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id NULLS FIRST, session_seq NULLS FIRST""".stripMargin,

    "q262_fd_audit" -> {
      def one(table: String, a: String, b: String) =
        s"""SELECT '$table' AS table_name, '$a' AS lhs, '$b' AS rhs,
           |CAST(sum(nk) AS BIGINT) AS n_rows,
           |CAST(count(*) AS BIGINT) AS n_keys,
           |CAST(sum(nk - mx) AS BIGINT) AS violations,
           |round(sum(nk - mx) * 1.0 / sum(nk) + 1e-12, 6) AS violation_rate
           |FROM (
           |  SELECT k, sum(c) AS nk, max(c) AS mx FROM (
           |    SELECT $a AS k, $b AS v, count(*) AS c FROM $table
           |    GROUP BY 1, 2) GROUP BY 1)""".stripMargin
      Seq(one("part", "p_brand", "p_type"),
        one("part", "p_type", "p_brand"),
        one("orders", "o_custkey", "o_orderpriority"),
        one("lineitem", "l_partkey", "l_suppkey"),
        one("lineitem", "l_orderkey", "l_returnflag"))
        .mkString("", "\nUNION ALL ",
          "\nORDER BY table_name NULLS FIRST, lhs NULLS FIRST, rhs NULLS FIRST")
    },

    // the same sha-256 arrival permutation, per-user running max in
    // exact integer microseconds, identical nudged output ratios
    "q373_watermark_planner" ->
      """WITH e AS (
        |  SELECT event_type, user_id, event_id, epoch_us(ts) AS us,
        |  sha256(CAST(event_id AS VARCHAR)) AS arr
        |  FROM events),
        |w AS (
        |  SELECT event_type, us,
        |  max(us) OVER (PARTITION BY user_id
        |    ORDER BY arr NULLS FIRST, event_id NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
        |  FROM e),
        |l AS (
        |  SELECT event_type,
        |  (hw IS NOT NULL AND us < hw) AS late,
        |  CASE WHEN hw IS NOT NULL AND us < hw THEN hw - us ELSE 0 END
        |    AS delay_us
        |  FROM w)
        |SELECT event_type, count(*) AS n_events,
        |CAST(count(*) FILTER (late) AS BIGINT) AS n_late,
        |round(count(*) FILTER (late) * 1.0 / count(*) + 1e-12, 6)
        |  AS late_share,
        |round(CASE WHEN count(*) FILTER (late) > 0
        |  THEN sum(delay_us) * 1.0 / (count(*) FILTER (late) * 1000000.0)
        |  ELSE 0.0 END + 1e-12, 6) AS avg_late_delay_s,
        |CAST(max(delay_us) AS BIGINT) AS max_delay_us
        |FROM l GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin
  )
}
