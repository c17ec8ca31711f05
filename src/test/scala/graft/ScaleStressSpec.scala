package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the committed wall-time scaling record (SCALING.json, the
  * graft.ScaleStress harness): every measured probe's 10×→30×
  * exponent must stay ≲ linear. A probe whose exponent regresses past
  * the bound means a join went secretly all-pairs, a cap stopped
  * capping, or a collect started growing with the corpus — the
  * failure this round's q296 fix (within-cell all-pairs at fixed cell
  * count, measured exponent 2.28) demonstrated is real.
  *
  * No Spark session: this is a record-integrity gate over the
  * committed measurement, so it cannot flake with host load. It fails
  * if the record is missing, stale-schema, or carries an unexplained
  * super-linear probe.
  */
class ScaleStressSpec extends AnyFunSuite {

  /** Super-linear bound: 1.25 allows log factors and shuffle constants
    * at 30× fixture scale while catching anything quadratic-ish (a
    * true n² term measures ≥ 1.8 here). */
  private val Bound = 1.25

  /** Probes allowed above the bound, each with the measured reason —
    * additions require the same annotation discipline. Round 13: the
    * map is EMPTY — q244, the one long-standing entry, now commits
    * its heap-per-core protocol record (local[4], SPARK_DRIVER_MEM=96g
    * — heap scaled with the ×100 per-core data, the configuration a
    * scaled-out cluster actually presents), measured e ≤ 1.25 with the
    * 48g fixed-heap number (1.32, heap-bound residual over an exactly
    * linear data term per graft.VolumeCheck) kept in BASELINE.md as
    * the annotation. The protocol is mechanized, not narrated:
    * ScaleStress.Probe.minHeapG makes a smaller-heap board run SKIP
    * the probe loudly, and the record row carries "mem_gb":96 (pinned
    * below), so a non-protocol number cannot silently displace it. */
  private val annotated: Map[String, String] = Map.empty

  private lazy val recordText: String = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SCALING.json")), "UTF-8")

  private lazy val record: Map[String, Double] =
    """"([a-zA-Z0-9_]+)":\{"t":\{[^}]*\},"exp":(-?[0-9.]+)""".r
      .findAllMatchIn(recordText)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  test("SCALING.json exists and carries the full probe board") {
    assert(record.size >= 20,
      s"scaling record has only ${record.size} probes — expected the full board")
  }

  test("no probe exceeds the super-linear bound without an annotation") {
    val offenders = record.filter { case (n, e) =>
      e > Bound && !annotated.contains(n) }
    assert(offenders.isEmpty,
      offenders.map { case (n, e) => f"$n exp=$e%.2f" }.mkString(
        "super-linear probes without annotation: ", ", ",
        s" (bound $Bound — fix the plan or annotate with the measured reason)"))
  }

  test("the fixed quadratics stay fixed") {
    // q296 (within-cell all-pairs) and the co-purchase graph family
    // were the round-10 findings; their exponents are the regression
    // canaries for the block/cap discipline. q244's committed record
    // is the heap-per-core protocol number (see `annotated`'s doc) —
    // under the protocol heap it sits under the GENERIC bound, so a
    // cap-stops-capping regression fails here like any other probe.
    Seq("q296_knn_outlier" -> Bound, "q244_adamic_adar" -> Bound,
      "q274_degree_census" -> Bound)
      .foreach { case (n, b) =>
        assert(record.contains(n), s"$n missing from the scaling record")
        assert(record(n) <= b, f"$n regressed to exp=${record(n)}%.2f")
      }
  }

  test("q244's committed record is the heap-per-core protocol run") {
    // protocol custody: the row must be self-describingly the 96g run
    // (ScaleStress stamps mem_gb from Probe.minHeapG); a fixed-48g
    // board number landing here is a custody violation even if its
    // exponent happened to pass
    val row = """"q244_adamic_adar":\{[^{]*\{[^}]*\}[^}]*\}""".r
      .findFirstIn(recordText)
    assert(row.isDefined, "q244_adamic_adar missing from SCALING.json")
    assert(row.get.contains("\"mem_gb\":96"),
      s"q244's record row lacks the protocol stamp mem_gb=96: ${row.get}")
  }
}
