package graft
/** Dev harness: run ONE named query with timing (and optionally dump
  * its parquet for tools/check_local.py). Not part of the driver
  * contract — Verify/Bench are; this exists so a single slow or
  * suspect query can be iterated on without a full 93-query sweep.
  *   runMain graft.One <name> <sfDir> [outDir] [reps]
  */
object One {
  def main(args: Array[String]): Unit = {
    // comma-separated names run back-to-back in one JVM, sharing the
    // warm session; oracle_sql.json accumulates every requested query
    // so one check_local.py call covers the whole batch.
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) Some(args(2)) else None
    // fail fast on a blank/whitespace outDir (round-15 verdict
    // What's-wrong #3: a shell-quoting accident passed '' and this
    // main happily mkdir'd a directory literally named '' at the repo
    // root, which then got committed and survived three hygiene
    // sweeps)
    outDir.foreach(d => require(d.trim.nonEmpty,
      "outDir is empty/blank — check shell quoting (a stray '' arg " +
        "creates a directory named '')"))
    val reps = if (args.length > 3) args(3).toInt else 2
    val spark = GraftSession.local("graft-one")
    // the Bench contention sentinel, printed before and after the
    // batch (round-16): standalone re-times on this host swing ±1 s
    // with neighbor load, and a measurement without its window
    // evidence is unusable for before/after comparisons
    def sentinel(): Double = {
      import org.apache.spark.sql.functions._
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0L, 20000000L, 1L, 32)
          .select(sum(xxhash64(col("id")))).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    sentinel() // untimed codegen warm-up, the Bench stance
    println(f"[sentinel] pre: ${sentinel()}%.3f s")
    // GRAFT_JOBLOG=1: print per-job wall times (job id, seconds, first
    // line of the call site) — the orchestration-cost profiler for
    // multi-job lifecycle queries (q321-class), where the flat cost is
    // job COUNT, not data volume.
    if (sys.env.get("GRAFT_JOBLOG").contains("1")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val site = Option(j.properties)
              .map(_.getProperty("callSite.short", "?")).getOrElse("?")
            starts.put(j.jobId, (System.nanoTime(), site))
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
              println(f"[job] ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
            }
          }
        })
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, {
        // a typo'd name should cost seconds, not a round-trip: rank all
        // registered queries by edit distance and print the 5 nearest
        def dist(a: String, b: String): Int = {
          val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
            if (i == 0) j else if (j == 0) i else 0)
          for (i <- 1 to a.length; j <- 1 to b.length)
            d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
              d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
          d(a.length)(b.length)
        }
        val near = SparkEntry.queries.keys.toSeq
          .sortBy(k => (dist(name, k), k)).take(5)
        spark.stop()
        sys.error(s"unknown query '$name'; did you mean: ${near.mkString(", ")}?")
      })
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[one] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
        spark.catalog.clearCache()
      }
      outDir.foreach { d =>
        new java.io.File(d).mkdirs()
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$d/$name")
        spark.catalog.clearCache()
      }
    }
    println(f"[sentinel] post: ${sentinel()}%.3f s")
    outDir.foreach { d =>
      val q = (s: String) => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t") + "\""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/oracle_sql.json"),
        SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
          .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    }
    spark.stop()
  }
}
