package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables, r2, r4, r6, r2n, r4n, r6n}

/** The relational operator inventory (SURVEY.md §2.1-§2.8): scans,
  * filter/projection pushdown, every join strategy, aggregation
  * (plain / distinct / rollup / cube), window functions, sort / top-k,
  * set operations, and the scalar-function surface (string / date /
  * math / JSON / array / conditional).
  *
  * Design rules applied throughout (SURVEY.md §4, §7.4):
  *  - purely declarative DataFrame plans — Catalyst does pruning +
  *    pushdown; `.explain` shows `PushedFilters` on every scan here;
  *  - `broadcast()` only on dims that stay small at any scale factor
  *    (region/nation are fixed-size in TPC-H; scaling tables are left
  *    to AQE, which picks broadcast at low SF and shuffle at 100 TB);
  *  - every output has a total deterministic ORDER BY (asc = NULLS
  *    FIRST, desc = NULLS LAST, stated explicitly in oracle SQL) and
  *    rounded doubles so the DuckDB hash-compare is stable;
  *  - no `collect()`, no driver-side loops — all plans are a single
  *    lazy DAG.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // -- deterministic-output helpers ---------------------------------------

  val queries: Map[String, Q] = Map(

    /** TPC-H Q1 shape: single scan + map-side partial agg; shuffle only on
      * the 2 low-cardinality grouping keys — optimal at any scale. */
    "q01_pricing_summary" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice"))).as("sum_base_price"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r4(avg(col("l_quantity"))).as("avg_qty"),
          r4(avg(col("l_extendedprice"))).as("avg_price"),
          r4(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    /** Projection + selective filter: both reach the parquet scan
      * (ReadSchema = 4 cols, PushedFilters on shipdate/discount/qty). */
    "q02_filter_pushdown" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-07-01 00:00:00")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          r2(col("l_extendedprice")).as("price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("price"))
    }),

    /** TPC-H Q6 shape: scan → filter → single scalar agg (no shuffle at
      * all beyond the final 1-row reduce). */
    "q03_revenue_scalar" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(r2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    /** TPC-H Q5 shape: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
      * region/nation are fixed-cardinality → explicit broadcast; the
      * scaling joins (lineitem⋈orders⋈customer) shuffle on their keys and
      * AQE upgrades them to broadcast when a side is small. */
    "q04_join_revenue_by_nation" -> ((s: SparkSession, dir: String) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA")
        .groupBy(n("n_name").as("n_name"))
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(desc_nulls_last("revenue"), asc_nulls_first("n_name"))
    }),

    /** Left-semi join (EXISTS): orders having at least one big lineitem. */
    "q05_semi_join" -> ((s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
      val big = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        .select(col("l_orderkey"))
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          r2(sum(col("o_totalprice"))).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    /** Left-anti join (NOT EXISTS): customers with no orders. */
    "q06_anti_join" -> ((s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          r2(avg(col("c_acctbal"))).as("avg_acctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    /** Range join: pairs of events from the same user within one hour —
      * equi key (user_id) carries the shuffle, the time range is a
      * post-join predicate, so this stays a hash/sort-merge join (never a
      * cartesian) and scales with per-user event density. */
    "q07_range_join" -> ((s: SparkSession, dir: String) => {
      val e = t(s, dir, "events")
      val a = e.select(col("user_id"), col("ts").as("ts_a"),
        col("event_id").as("id_a"), col("event_type").as("type_a"))
      val b = e.select(col("user_id"), col("ts").as("ts_b"),
        col("event_id").as("id_b"))
      a.join(b,
          a("user_id") === b("user_id") &&
          col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("type_a").as("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          r4n(avg(col("ts_b").cast("double") - col("ts_a").cast("double"))).as("avg_gap_sec"))
        .orderBy(col("event_type"))
    }),

    /** TPC-H Q13 shape: left outer join + two-level aggregation. */
    "q08_order_count_distribution" -> ((s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc_nulls_last("custdist"), desc_nulls_last("c_count"))
    }),

    /** Distinct aggregation (expand + two-phase agg under the hood). */
    "q09_count_distinct" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    /** ROLLUP grouping sets. */
    "q10_rollup" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), r2(sum(col("o_totalprice"))).as("sum_price"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    /** CUBE grouping sets. */
    "q11_cube" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    /** Ranking window functions: top-3 customers by balance per nation.
      * Single shuffle on the partition key; total ordering inside the
      * frame via (acctbal desc, custkey) makes ranks deterministic. */
    "q12_window_rank" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(desc_nulls_last("c_acctbal"), asc_nulls_first("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          r2(col("c_acctbal")).as("acctbal"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .filter(col("rn") <= 3)
        .orderBy(col("c_nationkey"), col("rn"))
    }),

    /** lag/lead: price delta between consecutive orders of a customer. */
    "q13_window_lag" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          r2(col("o_totalprice")).as("price"),
          r2(lag(col("o_totalprice"), 1).over(w)).as("prev_price"),
          r2(lead(col("o_totalprice"), 1).over(w)).as("next_price"),
          r2(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    /** Running-sum frame (unbounded preceding → current row). The raw
      * table has duplicate (suppkey, orderkey, linenumber) triples, so a
      * pre-aggregation establishes the unique granularity the frame
      * order needs to be total (and therefore cross-engine
      * deterministic); it also halves the window input — the same move
      * that keeps a 100 TB running total cheap. */
    "q14_running_sum" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .agg(sum(col("l_quantity")).as("qty"))
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          r2(sum(col("qty")).over(w)).as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    }),

    /** Top-k: Spark plans TakeOrderedAndProject — per-partition heap +
      * driver merge of k rows, no global sort. */
    "q15_topk" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), r2(col("o_totalprice")).as("price"))
        .orderBy(desc_nulls_last("price"), asc_nulls_first("o_orderkey"))
        .limit(10)
    }),

    /** UNION ALL + re-aggregate. */
    "q16_union_all" -> ((s: SparkSession, dir: String) => {
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      val cu = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      su.unionByName(cu)
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"))
    }),

    /** INTERSECT (distinct): nations having both suppliers + customers
      * with high balances. */
    "q17_intersect" -> ((s: SparkSession, dir: String) => {
      val su = t(s, dir, "supplier").filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("nationkey"))
      val cu = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nationkey"))
      su.intersect(cu).orderBy(col("nationkey"))
    }),

    /** EXCEPT (distinct): customer nations with no supplier presence. */
    "q18_except" -> ((s: SparkSession, dir: String) => {
      val cu = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cu.except(su).orderBy(col("nationkey"))
    }),

    /** Sorted distinct (dashboard A11/O4 shape from the reference). */
    "q19_distinct_sort" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "customer").select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))
    }),

    /** String function surface: upper/substr/concat/like/length. */
    "q20_string_funcs" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "part")
        .filter(col("p_name").like("%bolt%") || col("p_name").like("red%"))
        .groupBy(upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 4).as("name_pre"),
          concat_ws(":", col("p_brand"), col("p_type")).as("brand_type"))
        .agg(count(lit(1)).as("n"), r4n(avg(length(col("p_name")))).as("avg_name_len"))
        .orderBy(col("brand_u"), col("name_pre"), col("brand_type"))
    }),

    /** Date function surface: year/month/date_trunc on timestamps. */
    "q21_date_funcs" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .agg(count(lit(1)).as("n_orders"), r2(sum(col("o_totalprice"))).as("sum_price"))
        .orderBy(col("yr"), col("mo"))
    }),

    /** Math function surface: sqrt/ln/abs/floor/ceil, fused in one agg. */
    "q22_math_funcs" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          r2(sum(sqrt(col("l_extendedprice")))).as("sum_sqrt_price"),
          r2(sum(log(col("l_extendedprice")))).as("sum_ln_price"),
          r6(avg(abs(col("l_discount") - 0.05))).as("avg_abs_disc_dev"),
          sum(floor(col("l_quantity"))).cast("long").as("sum_floor_qty"),
          sum(ceil(col("l_quantity"))).cast("long").as("sum_ceil_qty"))
        .orderBy(col("l_returnflag"))
    }),

    /** JSON extraction from the events.props payload column. */
    "q23_json_extract" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          r4n(avg(col("k_val"))).as("avg_k"),
          sum(col("k_val")).as("sum_k"),
          max(col("k_val")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    /** Array function surface over embeddings (size / element_at /
      * higher-order aggregate for the L2 norm). */
    "q24_array_funcs" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "embeddings")
        .select(col("label").cast("long").as("lbl"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("e1"),
          sqrt(expr("aggregate(embedding, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))")).as("l2"))
        .groupBy(col("lbl"))
        .agg(count(lit(1)).as("n"), max(col("dim")).as("dim"),
          r6(avg(col("e1"))).as("avg_e1"), r4(avg(col("l2"))).as("avg_l2"))
        .orderBy(col("lbl"))
    }),

    /** Conditional aggregation (reference dashboard A8/A9 shape). */
    "q25_conditional_agg" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("event_type") === "error", 1)).as("n_error"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type").contains("click"), 1)).as("n_click_like"),
          r6n(avg(when(col("event_type") === "error", 1.0).otherwise(0.0))).as("error_rate"))
    }),

    /** Tumbling one-hour time bucket (batch twin of the streaming
      * windowed agg in graft.streaming). */
    "q26_time_bucket" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("sum_value"))
        .orderBy(col("bucket"))
    }),

    /** Sliding window (2h window, 1h slide) via the native window()
      * generator — each event lands in exactly 2 windows. */
    "q27_sliding_window" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("sum_value"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("n"), col("sum_value"))
        .orderBy(col("w_start"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_base_price,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |round(avg(l_quantity),4) AS avg_qty,
        |round(avg(l_extendedprice),4) AS avg_price,
        |round(avg(l_discount),4) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice,2) AS price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
        |  l_quantity NULLS FIRST, price NULLS FIRST""".stripMargin,

    "q03_revenue_scalar" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q04_join_revenue_by_nation" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        |count(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC NULLS LAST, n_name NULLS FIRST""".stripMargin,

    "q05_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers, round(avg(c_acctbal),2) AS avg_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment NULLS FIRST""".stripMargin,

    "q07_range_join" ->
      """SELECT a.event_type AS event_type, count(*) AS n_pairs,
        |round(avg(epoch(b.ts) - epoch(a.ts)) + 1e-12,4) AS avg_gap_sec
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |GROUP BY a.event_type
        |ORDER BY a.event_type NULLS FIRST""".stripMargin,

    "q08_order_count_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin,

    "q09_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q10_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |round(sum(o_totalprice),2) AS sum_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q11_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q12_window_rank" ->
      """SELECT c_nationkey, c_custkey, acctbal, rn, rnk, drnk FROM (
        |  SELECT c_nationkey, c_custkey, round(c_acctbal,2) AS acctbal,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC NULLS LAST, c_custkey NULLS FIRST))
        |WHERE rn <= 3
        |ORDER BY c_nationkey NULLS FIRST, rn NULLS FIRST""".stripMargin,

    "q13_window_lag" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS price,
        |round(lag(o_totalprice,1) OVER w,2) AS prev_price,
        |round(lead(o_totalprice,1) OVER w,2) AS next_price,
        |round(o_totalprice - lag(o_totalprice,1) OVER w,2) AS delta
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST)
        |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin,

    "q14_running_sum" ->
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        |round(sum(qty) OVER (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate NULLS FIRST, l_orderkey NULLS FIRST, l_linenumber NULLS FIRST
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
        |FROM (SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, sum(l_quantity) AS qty
        |      FROM lineitem GROUP BY 1,2,3,4)
        |ORDER BY l_suppkey NULLS FIRST, l_shipdate NULLS FIRST, l_orderkey NULLS FIRST,
        |  l_linenumber NULLS FIRST""".stripMargin,

    "q15_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS price
        |FROM orders
        |ORDER BY round(o_totalprice,2) DESC NULLS LAST, o_orderkey NULLS FIRST
        |LIMIT 10""".stripMargin,

    "q16_union_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT s_nationkey AS nationkey FROM supplier
        |  UNION ALL SELECT c_nationkey FROM customer)
        |GROUP BY nationkey ORDER BY nationkey NULLS FIRST""".stripMargin,

    "q17_intersect" ->
      """SELECT nationkey FROM (
        |  SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
        |  INTERSECT SELECT c_nationkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY nationkey NULLS FIRST""".stripMargin,

    "q18_except" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT SELECT s_nationkey FROM supplier)
        |ORDER BY nationkey NULLS FIRST""".stripMargin,

    "q19_distinct_sort" ->
      """SELECT DISTINCT c_mktsegment FROM customer
        |ORDER BY c_mktsegment NULLS FIRST""".stripMargin,

    "q20_string_funcs" ->
      """SELECT upper(p_brand) AS brand_u, substr(p_name,1,4) AS name_pre,
        |concat_ws(':', p_brand, p_type) AS brand_type,
        |count(*) AS n, round(avg(length(p_name)) + 1e-12,4) AS avg_name_len
        |FROM part
        |WHERE p_name LIKE '%bolt%' OR p_name LIKE 'red%'
        |GROUP BY 1, 2, 3
        |ORDER BY brand_u NULLS FIRST, name_pre NULLS FIRST, brand_type NULLS FIRST""".stripMargin,

    "q21_date_funcs" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |cast(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_price
        |FROM orders GROUP BY 1, 2, 3
        |ORDER BY yr NULLS FIRST, mo NULLS FIRST""".stripMargin,

    "q22_math_funcs" ->
      """SELECT l_returnflag,
        |round(sum(sqrt(l_extendedprice)),2) AS sum_sqrt_price,
        |round(sum(ln(l_extendedprice)),2) AS sum_ln_price,
        |round(avg(abs(l_discount - 0.05)),6) AS avg_abs_disc_dev,
        |cast(sum(floor(l_quantity)) AS BIGINT) AS sum_floor_qty,
        |cast(sum(ceil(l_quantity)) AS BIGINT) AS sum_ceil_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q23_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |round(avg(k_val) + 1e-12,4) AS avg_k, cast(sum(k_val) AS BIGINT) AS sum_k, max(k_val) AS max_k
        |FROM (SELECT event_type, cast(json_extract_string(props, '$.k') AS BIGINT) AS k_val FROM events)
        |GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    "q24_array_funcs" ->
      """SELECT lbl, count(*) AS n, max(dim) AS dim,
        |round(avg(e1),6) AS avg_e1, round(avg(l2),4) AS avg_l2 FROM (
        |  SELECT cast(label AS BIGINT) AS lbl,
        |  cast(len(embedding) AS BIGINT) AS dim,
        |  cast(embedding[1] AS DOUBLE) AS e1,
        |  sqrt(list_aggregate(list_transform(embedding, x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)), 'sum')) AS l2
        |  FROM embeddings)
        |GROUP BY lbl ORDER BY lbl NULLS FIRST""".stripMargin,

    "q25_conditional_agg" ->
      """SELECT count(*) AS n_total,
        |count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |count(CASE WHEN event_type LIKE '%click%' THEN 1 END) AS n_click_like,
        |round(avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) + 1e-12,6) AS error_rate
        |FROM events""".stripMargin,

    "q26_time_bucket" ->
      """SELECT cast(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, count(*) AS n,
        |round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin,

    "q27_sliding_window" ->
      """SELECT w_start, w_start + INTERVAL 2 HOUR AS w_end, count(*) AS n,
        |round(sum(value),2) AS sum_value FROM (
        |  SELECT cast(date_trunc('hour', ts) AS TIMESTAMP) AS w_start, value FROM events
        |  UNION ALL
        |  SELECT cast(date_trunc('hour', ts) AS TIMESTAMP) - INTERVAL 1 HOUR, value FROM events)
        |GROUP BY w_start ORDER BY w_start NULLS FIRST""".stripMargin
  )
}
