package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: key correctness by construction and the actual
  * 100 TB payoff — multi-dimensional min/max pruning that a
  * single-column sort cannot give. */
class ZOrderSpec extends SparkSuite {

  test("morton interleave round-trips: extracting even/odd bits recovers the dims") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val dims = Seq.fill(2000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = dims.toDF("a", "b").withColumn("z", Layout.zorder2(col("a"), col("b")))
    val back = df.collect().map { r =>
      val z = r.getAs[Long]("z")
      var a = 0L; var b = 0L
      for (i <- 0 until 16) {
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (r.getAs[Long]("a"), r.getAs[Long]("b"), a, b)
    }
    back.foreach { case (a0, b0, a1, b1) =>
      assert(a0 == a1 && b0 == b1, s"interleave lost bits: ($a0,$b0) -> ($a1,$b1)")
    }
  }

  test("z-layout prunes a 2-d box query where a 1-d sort layout cannot") {
    // simulate per-file min/max statistics: range-partition each layout
    // into 32 "files", collect each file's (min,max) of BOTH dims, and
    // count how many files a box predicate on (da, db) could skip
    val n = 32
    def fileStats(layout: DataFrame): Array[(Long, Long, Long, Long)] =
      layout.repartitionByRange(n, col("sortKey"))
        .groupBy(spark_partition_id().as("f"))
        .agg(min("da").as("la"), max("da").as("ha"),
          min("db").as("lb"), max("db").as("hb"))
        .collect().map(r => (r.getAs[Long]("la"), r.getAs[Long]("ha"),
          r.getAs[Long]("lb"), r.getAs[Long]("hb")))

    // needs the sf0.1 fixture: with sf0.001's 15 distinct users the
    // da dimension is so coarse that a 1-d da-sort legitimately
    // out-prunes the curve — the multi-dimensional win appears once
    // both dimensions have real cardinality. Cancel (not fail) when
    // the large fixture is absent.
    val bigSf = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$bigSf/events.parquet").exists(),
      s"sf0.1 fixture not generated")
    val base = Layout.eventZkeys(spark, bigSf)
    val zFiles = fileStats(base.withColumn("sortKey", col("zkey")))
    val aFiles = fileStats(base.withColumn("sortKey", col("da")))

    // box: a tight range in BOTH dimensions
    val (aLo, aHi, bLo, bHi) = (1000L, 3000L, 1000L, 9000L)
    def hits(files: Array[(Long, Long, Long, Long)]): Int =
      files.count { case (la, ha, lb, hb) =>
        la <= aHi && ha >= aLo && lb <= bHi && hb >= bLo }

    val zHits = hits(zFiles)
    val aHits = hits(aFiles)
    // the da-sorted layout prunes on da only: every da-matching file
    // spans the full db range, so the box prunes nothing further; the
    // z-layout must touch strictly fewer files
    assert(zHits < aHits,
      s"z-order must out-prune the 1-d layout: z=$zHits vs a=$aHits of $n files")
    assert(zHits <= n / 2,
      s"z-order should skip at least half the files for a tight box, touched $zHits/$n")
  }

  test("REAL parquet row-group pruning: z-ordered files out-skip a 1-d sort on disk") {
    // the actual 100 TB effect, not simulated stats: write the same
    // events twice — once laid out by zkey, once by da alone — into 32
    // parquet files each (one row group per file at this size), run the
    // SAME 2-d box filter on both, and read the rows-actually-read
    // counter off FileSourceScanExec. Parquet keeps per-row-group
    // min/max for da and db; the pushed box predicate lets the reader
    // skip whole row groups whose stats miss the box. In the da-sorted
    // layout every file spans the full db range (db stats prune
    // nothing); the z-layout gives BOTH dims partial locality, so it
    // must touch fewer row groups ⇒ output fewer rows from the scan.
    val bigSf = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$bigSf/events.parquet").exists(),
      s"sf0.1 fixture not generated")
    val base = Layout.eventZkeys(spark, bigSf)
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder_real")
    val zPath = s"$tmp/z_layout"; val aPath = s"$tmp/a_layout"
    // the layout step IS this write: repartitionByRange on the layout
    // key + sortWithinPartitions, exactly what OPTIMIZE ZORDER emits
    base.repartitionByRange(32, col("zkey")).sortWithinPartitions(col("zkey"))
      .write.parquet(zPath)
    base.repartitionByRange(32, col("da")).sortWithinPartitions(col("da"))
      .write.parquet(aPath)

    val (aLo, aHi, bLo, bHi) = (1000L, 3000L, 1000L, 9000L)
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec in plan"))
    def run(path: String): (Long, Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("da").between(aLo, aHi) && col("db").between(bLo, bHi))
      val result = df.count()
      df.collect() // materialize through the scan so metrics populate
      val scan = scanOf(df)
      // the box must reach the reader as PushedFilters, or nothing
      // can skip
      val pushed = scan.metadata("PushedFilters")
      assert(pushed.contains("da") && pushed.contains("db"),
        s"box predicate must be pushed to parquet: $pushed")
      (result, scan.metrics("numOutputRows").value, scan.metrics("numFiles").value)
    }
    val (zCount, zRead, zFiles) = run(zPath)
    val (aCount, aRead, aFiles) = run(aPath)
    assert(zCount == aCount, "layout must never change query results")
    assert(zFiles == 32 && aFiles == 32, "both layouts list all files (no partition pruning)")
    val total = Tables(spark, bigSf, "events").count()
    // real skipping happened at all (scan emitted far fewer than total)
    assert(zRead < total / 2,
      s"z-layout scan must skip most row groups: read $zRead of $total")
    // and the z-layout touches strictly fewer rows than the 1-d layout
    assert(zRead < aRead,
      s"z-order must out-prune the 1-d layout on disk: z=$zRead vs a=$aRead " +
        s"(result=$zCount rows, total=$total)")
  }

  test("q109 keys are consistent with eventZkeys and totally ordered output") {
    val q = Layout.queries("q109_zorder_key")(spark, sf)
    val rows = q.limit(200).collect()
    assert(rows.nonEmpty)
    val zs = rows.map(_.getAs[Long]("zkey"))
    assert(zs.sameElements(zs.sorted), "output must be zkey-ordered")
  }
}
