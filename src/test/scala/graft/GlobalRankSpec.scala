package graft

import org.apache.spark.sql.functions._
import graft.ops.GlobalRank

/** Direct unit coverage of the single-plan global-order machinery the
  * rank/quantile/packing operators ride (the oracle checks cover them
  * end-to-end; this pins the helper itself under hostile layouts). */
class GlobalRankSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(1123L)
  // duplicates on v force the tie-break column to carry the ordering
  private val rows = Seq.tabulate(5000)(i => (rnd.nextInt(500).toLong, i.toLong))

  test("withRowNumbers: contiguous 1..N ranks in sort order, under any input layout") {
    val expected: Array[Long] =
      rows.sortBy { case (v, id) => (v, id) }.map(_._2).toArray
    for (parts <- Seq(1, 3, 32)) {
      val df = rows.toDF("v", "id").repartition(parts)
      val got = GlobalRank.withRowNumbers(df, Seq(col("v"), col("id")), "rn",
          totalCol = Some("total"))
        .select(col("rn"), col("id"), col("total")).collect()
      assert(got.length == rows.length)
      assert(got.forall(_.getLong(2) == rows.length), "totalCol must be N on every row")
      val byRank = got.sortBy(_.getLong(0))
      assert(byRank.map(_.getLong(0)).sameElements(
          Array.tabulate(rows.length)(i => i + 1L)),
        s"ranks must tile 1..N exactly (layout $parts)")
      assert(byRank.map(_.getLong(1)).sameElements(expected),
        s"rank order must equal the (v, id) total order (layout $parts)")
      spark.catalog.clearCache()
    }
  }

  test("withRunningSum: equals the sequential prefix sum, under any input layout") {
    // NEGATIVE values included: a partition's total is its LAST cumsum,
    // not its max — this distribution makes the two disagree
    val signed = rows.map { case (v, id) => (v - 250L, id) }
    val ref: Array[Long] = // sum of v ordered by id
      signed.sortBy(_._2).scanLeft(0L)(_ + _._1).tail.toArray
    for (parts <- Seq(1, 7)) {
      val df = signed.toDF("v", "id").repartition(parts)
      val got = GlobalRank.withRunningSum(df, Seq(col("id")), "v", "run")
        .select(col("id"), col("run")).collect()
        .sortBy(_.getLong(0)).map(_.getLong(1))
      assert(got.sameElements(ref), s"running sum diverges (layout $parts)")
      spark.catalog.clearCache()
    }
  }

  test("empty input yields empty output, no crash") {
    val df = Seq.empty[(Long, Long)].toDF("v", "id")
    assert(GlobalRank.withRowNumbers(df, Seq(col("v")), "rn").count() == 0)
    assert(GlobalRank.withRunningSum(df, Seq(col("id")), "v", "run").count() == 0)
  }

  test("withRunningSum: a NULL value raises a readable error, not an executor NPE") {
    val df = Seq((Some(1L), 1L), (None: Option[Long], 2L), (Some(3L), 3L))
      .toDF("v", "id")
    val ex = intercept[Exception] {
      GlobalRank.withRunningSum(df, Seq(col("id")), "v", "run").count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("NULL in value column 'v'")),
      s"expected the fail-loud guard message, got: ${messages(ex)}")
  }

  test("withRunningSums: multi-column equals column-by-column, signed values included") {
    val df = Seq((3L, -5L, 1L), (1L, 2L, 2L), (-4L, 7L, 3L), (10L, -1L, 4L))
      .toDF("a", "b", "id")
    val multi = GlobalRank.withRunningSums(df, Seq(col("id")),
        Seq("a" -> "ca", "b" -> "cb"))
      .select(col("id"), col("ca"), col("cb")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val single = {
      val s1 = GlobalRank.withRunningSum(df, Seq(col("id")), "a", "ca")
      GlobalRank.withRunningSum(s1, Seq(col("id")), "b", "cb")
        .select(col("id"), col("ca"), col("cb")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    }
    assert(multi.toSeq == single.toSeq, s"multi ${multi.toSeq} vs single ${single.toSeq}")
    assert(multi.toSeq == Seq((1L, 3L, -5L), (2L, 4L, -3L), (3L, 0L, 4L), (4L, 10L, 3L)))
    assert(GlobalRank.withRunningSums(df, Seq(col("id")),
      Seq("a" -> "ca", "b" -> "cb")).columns.toSet == Set("a", "b", "id", "ca", "cb"))
    spark.catalog.clearCache()
  }

  test("internal _gr_off / _gr_pid columns do not leak into output schemas") {
    val df = rows.toDF("v", "id")
    val rn = GlobalRank.withRowNumbers(df, Seq(col("v"), col("id")), "rn")
    assert(rn.columns.toSet == Set("v", "id", "rn"),
      s"withRowNumbers leaked internals: ${rn.columns.mkString(",")}")
    val rs = GlobalRank.withRunningSum(df, Seq(col("id")), "v", "run")
    assert(rs.columns.toSet == Set("v", "id", "run"),
      s"withRunningSum leaked internals: ${rs.columns.mkString(",")}")
    spark.catalog.clearCache()
  }
}
