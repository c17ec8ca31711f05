package graft

import org.apache.spark.sql.functions._
import graft.ops.IncrementalAgg

/** Incremental moment-state merge: the merge ≡ rebuild contract on
  * randomized splits, plus the edge cases the full-outer must honor. */
class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  private def stats(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("n"), col("sum"), col("min"), col("max"), col("m2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

  test("merge of a random split equals the state of the whole, keys on either side pass through") {
    val rnd = new scala.util.Random(7L)
    val rows = Seq.tabulate(500) { i =>
      val k = s"k${rnd.nextInt(6)}"
      (if (k == "k5") "onlyA" else if (k == "k4") "onlyB" else k,
        rnd.nextDouble() * 200 - 100, rnd.nextBoolean())
    }
    val df = rows.toDF("k", "v", "inA")
    val a = IncrementalAgg.state(
      df.filter(col("inA") || col("k") === "onlyA").filter(col("k") =!= "onlyB"),
      "k", "v")
    val b = IncrementalAgg.state(
      df.filter(!col("inA") || col("k") === "onlyB").filter(col("k") =!= "onlyA"),
      "k", "v")
    val merged = stats(IncrementalAgg.merge(a, b, "k"))
    // rebuild from the union of exactly what a and b saw
    val aRows = df.filter((col("inA") || col("k") === "onlyA") && col("k") =!= "onlyB")
    val bRows = df.filter((!col("inA") || col("k") === "onlyB") && col("k") =!= "onlyA")
    val rebuilt = stats(IncrementalAgg.state(aRows.unionByName(bRows), "k", "v"))
    assert(merged.keySet == rebuilt.keySet)
    merged.foreach { case (k, (n, s, mn, mx, m2)) =>
      val (n2, s2, mn2, mx2, m22) = rebuilt(k)
      assert(n == n2 && mn == mn2 && mx == mx2, s"key $k exact fields diverge")
      assert(math.abs(s - s2) < 1e-9 && math.abs(m2 - m22) < 1e-7,
        s"key $k float fields diverge: sum $s vs $s2, m2 $m2 vs $m22")
    }
  }

  test("single-element groups merge to correct variance; null keys are ordinary keys") {
    val a = IncrementalAgg.state(Seq(("x", 2.0), (null, 5.0)).toDF("k", "v"), "k", "v")
    val b = IncrementalAgg.state(Seq(("x", 4.0), (null, 9.0)).toDF("k", "v"), "k", "v")
    val m = stats(IncrementalAgg.merge(a, b, "k").withColumn("k",
      coalesce(col("k"), lit("NULLKEY"))))
    val (nx, sx, _, _, m2x) = m("x")
    assert(nx == 2 && sx == 6.0 && math.abs(m2x - 2.0) < 1e-12) // var_pop=1, m2=2
    val (nn, sn, _, _, m2n) = m("NULLKEY")
    assert(nn == 2 && sn == 14.0 && math.abs(m2n - 8.0) < 1e-12) // (5,9): m2 = 8
  }
}
