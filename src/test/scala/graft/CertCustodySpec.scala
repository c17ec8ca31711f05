package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cert-artifact CUSTODY gate (round-11 verdict What's-wrong #1 —
  * fourth consecutive round of bench/correctness artifacts left
  * untracked or drifted at close, including a working-tree
  * bench_detail.json that was a DIFFERENT, slower run than the
  * committed snapshot next to it). Bench now writes the round
  * snapshot and commits the cert artifacts in the same pass that
  * stamps `certifiable:true`; this spec makes any remaining manual
  * slippage a hard test failure:
  *
  *  1. bench_detail.json must be byte-identical to the NEWEST
  *     bench_history snapshot — the tree reproduces the claim;
  *  2. the record it holds must be certifiable (sentinel-clean) —
  *     a contaminated run must never sit as the tree's record;
  *  3. neither bench_detail.json nor bench_history/ may be
  *     modified/untracked in git — a record that exists only in the
  *     working tree is not a record.
  *
  * Scratch runs belong in bench_detail_last.json (gitignored), which
  * Bench writes unconditionally; the certified files only ever hold
  * the round's best sentinel-clean record.
  */
class CertCustodySpec extends AnyFunSuite {

  private def read(p: java.nio.file.Path): String =
    java.nio.file.Files.readString(p)

  test("the working tree reproduces the newest committed bench record") {
    val detail = java.nio.file.Paths.get("bench_detail.json")
    assume(java.nio.file.Files.exists(detail),
      "no bench_detail.json — fresh checkout without a record")
    val histDir = java.nio.file.Paths.get("bench_history")
    assert(java.nio.file.Files.isDirectory(histDir),
      "bench_history/ missing — Bench must snapshot certified records")
    val newest = {
      val st = java.nio.file.Files.list(histDir)
      try {
        import scala.jdk.CollectionConverters._
        // NUMERIC round sort (round-12 ADVICE): a lexicographic filename
        // sort puts r100 before r99 once the %02d pad overflows
        st.iterator().asScala
          .flatMap(p => BenchCustody.roundOf(p.getFileName.toString).map(_ -> p))
          .toSeq.sortBy(_._1).lastOption.map(_._2)
      } finally st.close()
    }
    assert(newest.isDefined, "no bench_detail_r*.json snapshot in bench_history/")
    assert(read(detail) == read(newest.get),
      s"bench_detail.json differs from ${newest.get} — the tree does not " +
        "reproduce the certified claim; re-run Bench (it snapshots and " +
        "commits in the same pass) or check out the committed record")
    assert(!read(detail).contains("\"certifiable\":false"),
      "the tree's bench record is sentinel-contaminated — a dirty run " +
        "must live in bench_detail_last.json, never as the record")
  }

  test("a slower same-board run cannot displace the standing record across a round boundary") {
    // Round-12 custody defect, pinned: the 267.3 s post-close run
    // inferred "round 13", found no r13 snapshot, and displaced the
    // 231.2 s round-12 record. The decision now keys on the board.
    val names = Seq("q01_a", "q02_b", "q03_c")
    val board = BenchCustody.boardHash(names)
    def run(total: Double, b: String = board) =
      BenchCustody.Record(total, 3, b, certifiable = true)
    val standing = Seq(12 -> run(231.2))
    // slower run over the SAME board, inferred round 13: must keep
    assert(BenchCustody.decide(standing, 13, run(267.3)).isEmpty)
    // equal total ties to the standing record
    assert(BenchCustody.decide(standing, 13, run(231.2)).isEmpty)
    // faster same-board run becomes round 13's record
    assert(BenchCustody.decide(standing, 13, run(219.0)).contains(13))
    // faster same-board run still inside round 12 overwrites r12
    assert(BenchCustody.decide(standing, 12, run(219.0)).contains(12))
    // board change (query added), snapshot lacking per-query times
    // (legacy): writes the inferred round
    val grown = BenchCustody.boardHash(names :+ "q04_d")
    assert(BenchCustody.decide(standing, 13, run(300.0, grown)).contains(13))
    // no history at all: first record writes
    assert(BenchCustody.decide(Nil, 1, run(100.0)).contains(1))
  }

  test("a contended grown-board run cannot seed the standing record") {
    // Round-13 verdict What's-wrong #3: when wave 2 grew the board
    // 405→410, a visibly contended 373.5 s run became the standing
    // record unconditionally because no same-board snapshot existed.
    // A strict-SUPERSET board must now pass the drift gate on the
    // common subset before it can seed.
    val snapNames = Seq("q01_a", "q02_b", "q03_c")
    val snap = BenchCustody.Record(7.0, 3,
      BenchCustody.boardHash(snapNames), certifiable = true,
      times = Map("q01_a" -> 1.0, "q02_b" -> 2.0, "q03_c" -> 4.0),
      midMin = Some(0.33))
    val standing = Seq(13 -> snap)
    val grownBoard = BenchCustody.boardHash(snapNames :+ "q04_d")
    def grownRun(f: Double, mid: Double) = BenchCustody.Record(
      7.0 * f + 0.5, 4, grownBoard, certifiable = true,
      times = Map("q01_a" -> 1.0 * f, "q02_b" -> 2.0 * f,
        "q03_c" -> 4.0 * f, "q04_d" -> 0.5),
      midMin = Some(mid))
    // contended grown-board run (+40% on common subset, clean-looking
    // mid): REFUSED — wait for a clean run
    assert(BenchCustody.decide(standing, 14, grownRun(1.40, 0.33)).isEmpty)
    // clean grown-board run: seeds the round's record
    assert(BenchCustody.decide(standing, 14, grownRun(1.02, 0.33)).contains(14))
    // +25% common subset but the mid-sentinel shows a measured ~1.2x
    // slower host: the normalized bound admits it
    assert(BenchCustody.decide(standing, 14, grownRun(1.25, 0.40)).contains(14))
    // a SHRUNK board (query retired) still writes when its common
    // subset is clean — the record must cover the current registry
    val shrunk = BenchCustody.Record(3.0, 2,
      BenchCustody.boardHash(snapNames.init), certifiable = true,
      times = Map("q01_a" -> 1.0, "q02_b" -> 2.0))
    assert(BenchCustody.decide(standing, 14, shrunk).contains(14))
    // legacy snapshot without per-query times: nothing to gate on,
    // a changed board writes (the pre-round-13 record shape)
    val legacySnap = Seq(13 -> BenchCustody.Record(7.0, 3,
      BenchCustody.boardHash(snapNames), certifiable = true))
    assert(BenchCustody.decide(legacySnap, 14, grownRun(1.40, 0.33))
      .contains(14))
  }

  test("a contended mixed-change board cannot seed the standing record either") {
    // Round-14 ADVICE (medium): a board that ADDS and RETIRES queries
    // in the same round is neither a superset nor the same board — the
    // old strict-superset guard fell through to the unconditional
    // write, re-opening the round-13 What's-wrong #3 defect for
    // exactly the change shape this repo produces (q131 was retired
    // alongside additions). The gate now keys on the common subset
    // whenever one exists.
    val snap = BenchCustody.Record(7.0, 3,
      BenchCustody.boardHash(Seq("q01_a", "q02_b", "q03_c")),
      certifiable = true,
      times = Map("q01_a" -> 1.0, "q02_b" -> 2.0, "q03_c" -> 4.0),
      midMin = Some(0.33))
    val standing = Seq(14 -> snap)
    // q03_c retired, q05_e added: common subset = {q01_a, q02_b}
    def mixed(f: Double, mid: Double) = BenchCustody.Record(
      3.0 * f + 0.5, 3, BenchCustody.boardHash(Seq("q01_a", "q02_b", "q05_e")),
      certifiable = true,
      times = Map("q01_a" -> 1.0 * f, "q02_b" -> 2.0 * f, "q05_e" -> 0.5),
      midMin = Some(mid))
    // contended (+40% on the common subset, clean-looking mid): REFUSED
    assert(BenchCustody.decide(standing, 15, mixed(1.40, 0.33)).isEmpty)
    // clean mixed-change run: seeds the round's record
    assert(BenchCustody.decide(standing, 15, mixed(1.02, 0.33)).contains(15))
    // measured ~1.2x slower host widens the bound (the driftGate rule)
    assert(BenchCustody.decide(standing, 15, mixed(1.25, 0.40)).contains(15))
  }

  test("round-15 gate reference: the newest snapshot selection picks r15") {
    // Round-14 verdict What's-wrong #3: the driver's post-close 320.1 s
    // run legitimately seeded bench_history/bench_detail_r15.json;
    // round 15's drift gate and triage must reference THAT snapshot,
    // not the slower 328.0 s r14 one — otherwise the bar silently
    // regresses 2.5%. Pin the numeric-max selection on the real dir.
    val histDir = java.nio.file.Paths.get("bench_history")
    assume(java.nio.file.Files.isDirectory(histDir), "no bench_history/")
    val rounds = {
      val st = java.nio.file.Files.list(histDir)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .flatMap(p => BenchCustody.roundOf(p.getFileName.toString))
          .toSeq
      } finally st.close()
    }
    assume(rounds.exists(_ >= 15), "pre-round-15 tree — nothing to pin")
    val newest = rounds.max
    assert(newest >= 15,
      "newest-snapshot selection must resolve to the r15+ record (the " +
        "driver's post-close 320.1 s seed), never back to the r14 one — " +
        "Bench.gateRef and BenchDriftSpec both key on this numeric max")
    assert(java.nio.file.Files.exists(
      histDir.resolve(f"bench_detail_r$newest%02d.json")),
      "the selected snapshot must exist as the gate-reference file")
  }

  test("triage names exactly the over-threshold common-subset entries, worst-first") {
    // Round-13 verdict What's-wrong #1 (q385 is the canonical case:
    // record entries swung 0.09↔1.67 s on unchanged code): the
    // standalone re-time set is every common query whose sweep minimum
    // exceeds 1.5x the gate reference, floor-filtered and capped.
    val ref = Map("q385" -> 0.80, "q100" -> 0.21, "q84" -> 0.28,
      "tiny" -> 0.02, "clean" -> 1.00, "gone" -> 1.00)
    val cur = Map("q385" -> 1.67, "q100" -> 0.54, "q84" -> 0.30,
      "tiny" -> 0.30, "clean" -> 1.05, "failed" -> -1.0)
    val t = BenchCustody.triageSet(cur, ref)
    // q100 2.57x and q385 2.09x qualify; q84 (1.07x) and clean do
    // not; tiny is under the 0.05 s reference floor (grid noise);
    // 'gone'/'failed' are not common
    assert(t == Seq("q100", "q385"))
    // the cap keeps the WORST ratios
    val manyRef = (1 to 30).map(i => s"q$i" -> 1.0).toMap
    val manyCur = (1 to 30).map(i => s"q$i" -> (1.6 + i * 0.01)).toMap
    val capped = BenchCustody.triageSet(manyCur, manyRef)
    assert(capped.size == 20 && capped.head == "q30" &&
      !capped.contains("q1"))
  }

  test("triage iterates to a fixpoint — the cap batches the work, it no longer bounds coverage") {
    // Round-15 verdict What's-wrong #2: the certified record carried
    // a 41-entry >1.3× contention tail because one capped pass could
    // re-time at most 20 — the cap BOUND. The fixpoint re-times in
    // capped batches until every over-threshold common-subset entry
    // has its standalone number.
    val ref = (1 to 30).map(i => s"q$i" -> 1.0).toMap
    val cur = (1 to 30).map(i => s"q$i" -> (1.6 + i * 0.01)).toMap
    var calls = Map.empty[String, Int].withDefaultValue(0)
    val (times, retimed) = BenchCustody.triageFixpoint(cur, ref, { n =>
      calls += n -> (calls(n) + 1); 0.9
    })
    assert(retimed.keySet == cur.keySet,
      s"all 30 over-threshold entries must end re-timed, got ${retimed.size}")
    assert(calls.values.forall(_ == 1), "each entry re-times exactly once")
    assert(times.values.forall(_ == 0.9))
    // a confirmed slowdown is NOT re-rolled: entries still over
    // threshold after their standalone re-time keep that reading and
    // the loop still terminates
    var calls2 = Map.empty[String, Int].withDefaultValue(0)
    val (t2, r2) = BenchCustody.triageFixpoint(cur, ref, { n =>
      calls2 += n -> (calls2(n) + 1); 2.5
    })
    assert(r2.keySet == cur.keySet && calls2.values.forall(_ == 1))
    assert(t2.values.forall(_ == 2.5),
      "the standalone number is the chosen measurement even when slow")
    // a failed re-time (-1) keeps the sweep entry but counts as triaged
    val (t3, r3) = BenchCustody.triageFixpoint(
      Map("a" -> 2.0), Map("a" -> 1.0), _ => -1.0)
    assert(t3("a") == 2.0 && r3("a") == -1.0)
    // clean board: no re-times at all
    val (t4, r4) = BenchCustody.triageFixpoint(ref, ref,
      _ => fail("nothing to triage on a clean board"))
    assert(t4 == ref && r4.isEmpty)
    // total-cost ceiling: a contention-condemned board (more
    // over-threshold entries than TriageMaxRetimes) stops re-timing
    // at the ceiling — the tail stays sweep-coupled and the drift
    // gate owns the refusal, never an unbounded re-time marathon
    val bigRef = (1 to 100).map(i => s"b$i" -> 1.0).toMap
    val bigCur = (1 to 100).map(i => s"b$i" -> 2.0).toMap
    val (_, r5) = BenchCustody.triageFixpoint(bigCur, bigRef, _ => 2.0)
    assert(r5.size == BenchCustody.TriageMaxRetimes,
      s"ceiling must bind at ${BenchCustody.TriageMaxRetimes}: ${r5.size}")
  }

  test("custody parser round-trips the explicit fields and derives them for legacy records") {
    val names = Seq("q01_a", "q02_b")
    val board = BenchCustody.boardHash(names)
    val modern = s"""{"metric":"total","value":12.5,"unit":"sec","runs":2,""" +
      s""""mid_sentinels_s":[0.35,0.33,0.34],""" +
      s""""n_queries":2,"board":"$board","certifiable":true,""" +
      s""""queries":{"q01_a":7.0,"q02_b":5.5},"sf":"x"}"""
    val m = BenchCustody.parse(modern).get
    assert(m.total == 12.5 && m.nQueries == 2 && m.board == board &&
      m.certifiable)
    assert(m.times == Map("q01_a" -> 7.0, "q02_b" -> 5.5))
    assert(m.midMin.contains(0.33))
    // legacy record (pre-round-13): no n_queries/board/mid-sentinels —
    // board derived from the queries-map keys, so same hashes equal
    val legacy = """{"metric":"total","value":13.0,"unit":"sec","certifiable":true,""" +
      """"queries":{"q01_a":8.0,"q02_b":5.0},"sf":"x"}"""
    val p = BenchCustody.parse(legacy).get
    assert(p.board == board && p.nQueries == 2 && p.total == 13.0)
    assert(p.midMin.isEmpty)
    assert(BenchCustody.roundOf("bench_detail_r100.json").contains(100))
    assert(BenchCustody.roundOf("bench_detail_r09.json").contains(9))
    assert(BenchCustody.roundOf("notes.json").isEmpty)
  }

  test("cert artifacts are committed, not working-tree-only") {
    val rc = try {
      val pb = new ProcessBuilder("git", "status", "--porcelain", "--",
        "bench_detail.json", "bench_history")
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes())
      p.waitFor()
      if (p.exitValue() != 0) None else Some(out.trim)
    } catch { case _: Throwable => None }
    assume(rc.isDefined, "git unavailable — custody check skipped")
    assert(rc.get.isEmpty,
      s"uncommitted cert artifacts:\n${rc.get}\nBench auto-commits " +
        "certified records; commit (or discard) these before closing")
  }
}
