package graft

import org.apache.spark.sql.functions._
import graft.ops.Quantiles

import scala.util.Random

/** [[graft.ops.Quantiles.exactQuantiles]] vs Spark's buffering
  * `percentile` aggregate. The two interpolate between the SAME
  * bracketing values; formulas differ only in ulp-level double
  * association (ours matches DuckDB's quantile_cont
  * `lo + (hi-lo)*frac`; Spark's is the symmetric
  * `(1-frac)*lo + frac*hi`), so agreement is asserted to 1e-9 on
  * randomized data and EXACTLY on hand-computed fixtures. */
class QuantilesSpec extends SparkSuite {

  private val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
    "p00" -> 0.0, "p95" -> 0.95, "p100" -> 1.0)

  test("grouped quantiles match percentile on randomized data with ties, skew, and tiny groups") {
    import spark.implicits._
    val rnd = new Random(42)
    // group g0: large, mostly-distinct; g1: heavy ties; g2: single row;
    // g3: two rows; g4: all-identical values; plus nulls sprinkled in
    val rows: Seq[(String, Option[Double])] =
      (1 to 2000).map(_ => "g0" -> Some(rnd.nextDouble() * 1000 - 500)) ++
      (1 to 500).map(_ => "g1" -> Some((rnd.nextInt(7) + 1).toDouble)) ++
      Seq("g2" -> Some(3.14)) ++
      Seq("g3" -> Some(1.0), "g3" -> Some(2.0)) ++
      (1 to 40).map(_ => "g4" -> Some(9.9)) ++
      (1 to 30).map(i => s"g${i % 5}" -> Option.empty[Double])
    val df = rnd.shuffle(rows).toDF("g", "v")

    val got = Quantiles.exactQuantiles(df, Seq("g"), "v", qs)
      .collect().map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1))).toMap
    val wantCols = qs.map { case (n, q) => expr(s"percentile(v, $q)").as(n) }
    val want = df.groupBy(col("g")).agg(wantCols.head, wantCols.tail: _*)
      .collect().map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1))).toMap

    assert(got.keySet === want.keySet)
    for (g <- want.keySet; i <- qs.indices)
      assert(math.abs(got(g)(i) - want(g)(i)) < 1e-9,
        s"group $g ${qs(i)._1}: got ${got(g)(i)} want ${want(g)(i)}")
  }

  test("global (ungrouped) quantiles match percentile") {
    import spark.implicits._
    val rnd = new Random(7)
    val df = (1 to 3000).map(_ => rnd.nextGaussian() * 50).toDF("v")
    val got = Quantiles.exactQuantiles(df, Seq.empty, "v", qs).collect().head
    val wantCols = qs.map { case (n, q) => expr(s"percentile(v, $q)").as(n) }
    val want = df.agg(wantCols.head, wantCols.tail: _*).collect().head
    for (i <- qs.indices)
      assert(math.abs(got.getDouble(i) - want.getDouble(i)) < 1e-9, qs(i)._1)
  }

  test("hand-computed fixture is exact (incl. interpolation and endpoints)") {
    import spark.implicits._
    // values 10,20,30,40: p25 → pos=0.75 → 10+0.75*10=17.5; p50 → 25;
    // p100 → 40; p00 → 10
    val df = Seq("a" -> 10.0, "a" -> 40.0, "a" -> 20.0, "a" -> 30.0).toDF("g", "v")
    val r = Quantiles.exactQuantiles(df, Seq("g"), "v",
      Seq("p00" -> 0.0, "p25" -> 0.25, "p50" -> 0.5, "p100" -> 1.0)).collect().head
    assert(r.getDouble(1) === 10.0)
    assert(r.getDouble(2) === 17.5)
    assert(r.getDouble(3) === 25.0)
    assert(r.getDouble(4) === 40.0)
  }

  test("a NULL group key is an ordinary group, matching percentile-over-groupBy") {
    import spark.implicits._
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 10.0), (None, 30.0))
      .toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, Seq("g"), "v", Seq("p50" -> 0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(got == Map(Some("a") -> 2.0, None -> 20.0),
      s"null group must survive the rank joins: $got")
    val wgot = Quantiles.weightedQuantiles(
        df.withColumn("w", lit(1L)), Seq("g"), "v", "w", Seq("wp50" -> 0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(wgot == Map(Some("a") -> 1.0, None -> 10.0),
      s"null group must survive the weighted path too: $wgot")
  }

  test("null values are ignored; all-null group is absent") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", None))
      .toDF("g", "v")
    val out = Quantiles.exactQuantiles(df, Seq("g"), "v", Seq("p50" -> 0.5))
    val rows = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows === Map("a" -> 2.0))
  }

  test("results are independent of the input partition layout") {
    import spark.implicits._
    val rnd = new Random(11)
    val base = (1 to 1500).map(_ => ("g" + rnd.nextInt(4), rnd.nextDouble() * 100))
    val reference = Quantiles.exactQuantiles(
      base.toDF("g", "v"), Seq("g"), "v", qs).collect()
      .map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1))).toMap
    // the rank machinery leans on repartitionByRange + MID internals —
    // any layout sensitivity is a correctness bug, not a perf one
    for (parts <- Seq(1, 3, 17, 64)) {
      val df = rnd.shuffle(base).toDF("g", "v").repartition(parts)
      val got = Quantiles.exactQuantiles(df, Seq("g"), "v", qs).collect()
        .map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1))).toMap
      assert(got == reference, s"layout with $parts input partitions changed the result")
    }
  }

  test("weighted quantiles match a brute-force reference, independent of layout") {
    import spark.implicits._
    val rnd = new Random(5)
    val rows = (1 to 1200).map(_ =>
      ("g" + rnd.nextInt(3), rnd.nextInt(200).toDouble, (1 + rnd.nextInt(9)).toLong))
    // brute force: per group sort by value, walk the prefix weights
    def brute(q: Double): Map[String, Double] =
      rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.sortBy(_._2)
        val total = sorted.map(_._3).sum
        var acc = 0L
        g -> sorted.collectFirst {
          case (_, v, w) if { acc += w; acc >= q * total } => v
        }.get
      }
    val expect50 = brute(0.5); val expect90 = brute(0.9)
    for (parts <- Seq(1, 7, 40)) {
      val df = rnd.shuffle(rows).toDF("g", "v", "w").repartition(parts)
      val got = Quantiles.weightedQuantiles(df, Seq("g"), "v", "w",
        Seq("wp50" -> 0.5, "wp90" -> 0.9)).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      got.foreach { case (g, (p50, p90)) =>
        assert(p50 == expect50(g), s"$parts parts, group $g p50: $p50 vs ${expect50(g)}")
        assert(p90 == expect90(g), s"$parts parts, group $g p90: $p90 vs ${expect90(g)}")
      }
      assert(got.keySet == expect50.keySet)
    }
  }

  test("plan carries no TypedImperativeAggregate percentile buffer") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g" + i % 3, i.toDouble)).toDF("g", "v")
    val plan = Quantiles.exactQuantiles(df, Seq("g"), "v", Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), "exact quantile must not fall back to percentile")
  }
}
