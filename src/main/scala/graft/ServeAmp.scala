package graft

import org.apache.spark.sql.functions._

/** Serve-latency READ-AMPLIFICATION measurement (round-11 verdict
  * Next #7): the stores are maintained and compacted — this measures
  * what compaction BUYS a reader, so the compaction cadence is a
  * number-driven decision instead of a default. Builds the q229-class
  * band index at x10 as 24 append generations (the fragmented state a
  * few days of snapshot appends leave), times (a) a raw full scan of
  * the index and (b) the q281 serve probe against it, then compacts
  * via rewriteSwap and times both again. min-of-2, cache cleared per
  * rep; results go to BASELINE.md next to the q321/q322 lifecycle
  * exponents.
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.ServeAmp [baseDir]"
  */
object ServeAmp {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local("graft-serve-amp")
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dir = ScaleStress.synthesize(s, base, 10)
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val snap = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val path = "/tmp/graft_serveamp/band"
    llm.StateStores.rmTree(java.nio.file.Paths.get(path))
    (0 until 24).foreach { g =>
      val mode = if (g == 0) "overwrite" else "append"
      llm.StateStores
        .bandIndexRows(s, corpus.filter(pmod(col("doc_id"), lit(24)) === g))
        .write.mode(mode).parquet(path)
    }
    def nFiles: Long = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try st.filter(_.toString.endsWith(".parquet")).count()
      finally st.close()
    }
    def time(f: => Long): Double = (1 to 2).map { _ =>
      s.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }.min
    def report(tag: String): Unit = {
      val files = nFiles
      val scan = time(s.read.parquet(path).count())
      val serve = time(llm.StateStores.bandServe(s, snap, corpus, path).count())
      println(f"[serveamp] $tag%-10s files=$files%4d scan=$scan%7.2f s serve=$serve%7.2f s")
    }
    report("fragmented")
    llm.StateStores.rewriteSwap(s.read.parquet(path), path)
    report("compacted")

    // ---- version-store GC ROI (round 13): what pruneVersions buys a
    // reader. A long-lived centroid/codebook sink accumulates one
    // v=<id> model snapshot per micro-batch; the serve path pays a
    // full directory listing (latestVersionBelow) plus parquet
    // footer/discovery work that grows with the version count even
    // though it reads ONE version. 120 simulated micro-batches, then
    // retention 4 — the read is timed against the same max version.
    val vpath = "/tmp/graft_serveamp/cent_versions"
    llm.StateStores.rmTree(java.nio.file.Paths.get(vpath))
    val model = s.range(0, 16).selectExpr("id AS cent_id")
      .crossJoin(s.range(0, 64).selectExpr("id AS pos"))
      .selectExpr("cent_id", "pos",
        "cast(cent_id * 64 + pos AS double) / 1024 AS coord",
        "cast(100 AS long) AS n")
    (0 until 120).foreach(v => llm.StateStores.writeVersion(model, vpath, v))
    def timeMs(f: => Unit): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }.min
    def reportV(tag: String): Unit = {
      val nv = {
        val st = java.nio.file.Files.list(java.nio.file.Paths.get(vpath))
        try st.filter(_.getFileName.toString.startsWith("v=")).count()
        finally st.close()
      }
      val pick = timeMs {
        llm.StateStores.latestVersionBelow(vpath, Long.MaxValue); ()
      }
      val read = timeMs {
        val v = llm.StateStores.latestVersionBelow(vpath, Long.MaxValue)
        s.read.parquet(s"$vpath/v=$v").count(); ()
      }
      println(f"[serveamp] $tag%-10s versions=$nv%4d pick=$pick%7.1f ms " +
        f"pick+read=$read%7.1f ms")
    }
    reportV("unpruned")
    llm.StateStores.pruneVersions(vpath, keep = 4)
    reportV("pruned")
    s.stop()
  }
}
