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
    s.stop()
  }
}
