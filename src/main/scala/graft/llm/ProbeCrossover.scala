package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe-vs-exact containment crossover measurement (round-9, VERDICT
  * item #4): times [[TextDedup.exactContainment]] against
  * [[TextDedup.probeContainment]] on the sf0.1 fixture and on
  * synthetic variants that inject GROUP BOILERPLATE — per-group
  * 12-token tails whose ~10 shingles land at df ≈ group size, just
  * under the 512 cap, which is exactly the regime the probe path's
  * avoided-join-volume argument targets (capped Σdf² dominated by
  * near-cap shingles). Corpus scaling replicates docs with offset ids
  * and replica-keyed groups so per-shingle df stays constant while
  * the index grows.
  *
  * Results are recorded in BASELINE.md; this main is a measurement
  * harness, not part of the driver contract.
  *
  *   runMain graft.llm.ProbeCrossover
  */
object ProbeCrossover {

  /** Append a group-keyed 12-token boilerplate tail: every token
    * carries the group id, so each group contributes ~10 shingles
    * with df = group size (capped-universe members, not stop-shingle
    * dropouts). */
  private def withBoiler(docs: DataFrame, nGroups: Int): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"), lit(" "),
        concat_ws(" ", (0 until 12).map(i =>
          concat(lit(s"tpl${i}g"), pmod(col("doc_id"), lit(nGroups)))): _*))
        .as("text"))

  /** `r` verbatim replicas with offset ids; group keys diverge per
    * replica via the id offset, keeping df per shingle ~constant. */
  private def replicate(docs: DataFrame, r: Int, offset: Long): DataFrame =
    (0 until r).map(i =>
      docs.select((col("doc_id") + lit(i * offset)).as("doc_id"), col("text")))
      .reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("probe-crossover")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = 3
    val base = graft.Tables(s, sfDir, "documents")
      .select(col("doc_id"), col("text")).filter(col("text").isNotNull)

    // clearCache evicts BOTH the measured path's intermediates and the
    // pinned variant — re-cache and re-count `d` after each clear so
    // the text synthesis stays excluded from every timed rep (round-9
    // advice: the old form re-ran the synthesis inside the timing,
    // compressing the recorded crossover ratios toward 1)
    def time(d: DataFrame)(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var n = 0L
      (1 to reps).foreach { _ =>
        s.catalog.clearCache()
        d.cache(); d.count()
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }

    val variants: Seq[(String, DataFrame)] = Seq(
      "fixture-1x" -> base,
      "boiler-1x (12 groups, df~417)" -> withBoiler(base, 12),
      "boiler-1x-dense (10 groups, df~500)" -> withBoiler(base, 10),
      "boiler-3x (same df, 3x index)" ->
        withBoiler(replicate(base, 3, 1000000L), 12))

    println(f"[xover] ${"variant"}%-36s ${"exact_s"}%8s ${"probe_s"}%8s  pairs")
    variants.foreach { case (name, docs) =>
      val d = docs.cache(); d.count() // pin the variant so text synthesis is not timed
      val (te, ne) = time(d)(TextDedup.exactContainment(d).count())
      val (tp, np) = time(d)(TextDedup.probeContainment(d).count())
      require(ne == np, s"$name: probe row count $np != exact $ne")
      println(f"[xover] $name%-36s $te%8.2f $tp%8.2f  $ne")
      d.unpersist()
    }
    s.stop()
  }
}
