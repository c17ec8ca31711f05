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
    * additions require the same annotation discipline. */
  private val annotated: Map[String, String] = Map(
    "q244_adamic_adar" ->
      ("x30->x100 wall exponent 1.32 with a DATA TERM measured EXACTLY " +
        "linear by direct count (graft.VolumeCheck, round 12: edges " +
        "3573/35730/107190/357300 and capped wedges 1396/13960/41880/" +
        "139600 at x1/10/30/100 — 10.000x/30.000x/100.000x the base, " +
        "hub cap 512 binding identically per replica). The residual is " +
        "HEAP pressure at the record config's 48g: the same local[4] " +
        "run with a 96g heap measures e = 1.11 (26.8 -> 101.5 s), and " +
        "local[32]/48g reads 1.39 (more concurrent hash state, more GC) " +
        "— a cluster sizes executor heap per core and does not hit this " +
        "wall; full A/B series in BASELINE.md round 12"))

  private lazy val record: Map[String, Double] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SCALING.json")), "UTF-8")
    """"([a-zA-Z0-9_]+)":\{"t":\{[^}]*\},"exp":(-?[0-9.]+)\}""".r
      .findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

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
    // canaries for the block/cap discipline. q244 carries a measured
    // volume-linear annotation (see `annotated`) — its canary bound is
    // the annotated ceiling, not the generic one: a TRUE quadratic
    // regression (a cap stopping to cap) reads >= 1.8 at this harness
    // and still fails here.
    Seq("q296_knn_outlier" -> Bound, "q244_adamic_adar" -> 1.40,
      "q274_degree_census" -> Bound)
      .foreach { case (n, b) =>
        assert(record.contains(n), s"$n missing from the scaling record")
        assert(record(n) <= b, f"$n regressed to exp=${record(n)}%.2f")
      }
  }
}
