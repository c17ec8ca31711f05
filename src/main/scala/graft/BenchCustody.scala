package graft

/** Bench-record custody: the board-keyed round's-best policy, plus the
  * round-14 coupling/drift hardening.
  *
  * Round-12 verdict What's-wrong #1: custody's round-inference let a
  * SLOWER same-board run displace the round's best record — the 23:01
  * 267.3 s run inferred "round 13", found no r13 snapshot, and
  * unconditionally replaced bench_detail.json while the 231.2 s record
  * sat in bench_history. The fix: the keep/replace decision keys on
  * the QUERY BOARD (the set of query names), not the inferred round
  * number — a run over the same board as an existing snapshot must
  * beat that snapshot's total to become the standing record,
  * regardless of which round either belongs to.
  *
  * Round-13 verdict hardening (all three pinned by CertCustodySpec):
  *
  *  - What's-wrong #1 (coupling noise): per-query record entries were
  *    not independent of board neighbors — q385 swung 0.09↔1.67 s on
  *    UNTOUCHED code purely from in-sweep cache/warm-up coupling, and
  *    the 1.15× drift gate was nearly binding on that noise.
  *    [[triageSet]] names the queries whose in-sweep minima exceed
  *    1.5× the gate reference; Bench re-times exactly those standalone
  *    (the graft.One stance, decoupled from sweep neighbors) before
  *    stamping `certifiable`, and records which entries carry a
  *    standalone re-time.
  *  - What's-wrong #3 (board growth resets the bar): a grown-board run
  *    used to seed the round's record unconditionally because no
  *    same-board snapshot existed — the first 410-board record was a
  *    visibly contended 373.5 s run. [[decide]] now gates a
  *    strict-SUPERSET board against the newest snapshot's
  *    common-subset total before the grown run can seed.
  *  - Next #8 (host decay eats gate headroom): [[driftGate]] widens
  *    the 1.15× bound by the records' mid-sentinel ratio (capped), so
  *    a same-code run on a measurably slower host still passes while a
  *    genuine code regression on a clean host still fails.
  *
  * Kept free of Spark/file-system state so CertCustodySpec can pin
  * every rule directly.
  */
object BenchCustody {

  /** The custody-relevant slice of a bench_detail record. `times` maps
    * full query names to per-query seconds (−1.0 = failed); `midMin`
    * is the minimum of the record's mid-weight sentinel readings — the
    * host-speed proxy [[driftGate]] normalizes by. */
  final case class Record(total: Double, nQueries: Int, board: String,
                          certifiable: Boolean,
                          times: Map[String, Double] = Map.empty,
                          midMin: Option[Double] = None)

  /** Stable fingerprint of a query board: MD5/48-bit over the sorted
    * name list. Collisions across ~20 rounds of boards are negligible;
    * the fingerprint only ever distinguishes boards this repo produced. */
  def boardHash(names: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(names.sorted.mkString("\n").getBytes("UTF-8"))
    md.digest().take(6).map(b => f"$b%02x").mkString
  }

  /** Parse the custody fields out of a bench_detail JSON record.
    * Explicit `n_queries`/`board` fields when present (round >= 13);
    * otherwise derived from the flat queries map, whose keys contain
    * no quotes/braces/colons by construction. */
  def parse(txt: String): Option[Record] = {
    val total = """"value":([-0-9.Ee]+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toDouble).getOrElse(return None)
    val times: Map[String, Double] =
      """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt).map(_.group(1)) match {
        case Some(qm) => """"([^"]+)":([-0-9.Ee]+)""".r.findAllMatchIn(qm)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
        case None => return None
      }
    val board = """"board":"([0-9a-f]+)"""".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse(boardHash(times.keys.toSeq))
    val n = """"n_queries":(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt).getOrElse(times.size)
    val midMin = """"mid_sentinels_s":\[([^\]]*)\]""".r.findFirstMatchIn(txt)
      .map(_.group(1).split(',').map(_.trim.toDouble))
      .filter(_.nonEmpty).map(_.min)
    Some(Record(total, n, board, !txt.contains("\"certifiable\":false"),
      times, midMin))
  }

  /** Extract the round number from a snapshot file name, for NUMERIC
    * ordering (round-12 ADVICE: lexicographic sort misorders r100 vs
    * r99 once the pad overflows). */
  def roundOf(fileName: String): Option[Int] =
    """bench_detail_r(\d+)\.json""".r.findFirstMatchIn(fileName)
      .map(_.group(1).toInt)

  /** The cross-round drift bound on common-subset totals. */
  val DriftBound = 1.15

  /** Shared triage tuning — ONE set of literals for the single-pass
    * [[triageSet]] and the iterated [[triageFixpoint]], so the
    * production path and the spec-pinned semantics cannot silently
    * diverge on a threshold retune. */
  val TriageThreshold = 1.5
  val TriageFloorSec = 0.05
  val TriageCap = 20

  /** Hard ceiling on TOTAL standalone re-times across a fixpoint run
    * (4 batches' worth): past this many over-threshold entries the
    * run is condemned by contention, not fixable by triage — the
    * remaining tail stays sweep-coupled and the drift gate (which
    * such a run cannot pass anyway) owns the refusal. Restores the
    * bounded-cost property the per-batch cap alone no longer gives
    * the iterated form. */
  val TriageMaxRetimes = 80

  /** Standalone re-time TRIAGE (round-13 verdict What's-wrong #1): the
    * common-subset queries whose in-sweep minima exceed `threshold`×
    * the gate reference's entry — coupling-noise suspects that must be
    * re-timed standalone before the run certifies. Reference entries
    * under `floorSec` are excluded (a 0.02 s entry tripling is grid
    * noise, not coupling); the set is capped at `cap` worst ratios so
    * one batch's cost stays bounded, worst-first so a cap bites the
    * least suspicious entries. Failed queries (−1) never triage. */
  def triageSet(cur: Map[String, Double], ref: Map[String, Double],
      threshold: Double = TriageThreshold, floorSec: Double = TriageFloorSec,
      cap: Int = TriageCap): Seq[String] =
    cur.keySet.intersect(ref.keySet).toSeq
      .filter(k => cur(k) >= 0 && ref(k) >= floorSec &&
        cur(k) > threshold * ref(k))
      .sortBy(k => -cur(k) / ref(k))
      .take(cap)

  /** [[triageSet]] iterated to a FIXPOINT (round-15 verdict
    * What's-wrong #2: the single capped pass left a 41-entry
    * >1.3× contention tail in the certified record — the cap BOUND,
    * and 21 over-threshold entries certified sweep-coupled). Batches
    * of up to `cap` worst ratios are re-timed via `retime`, the
    * rankings recomputed over the updated entries, and the loop
    * repeats until no over-threshold common-subset entry remains
    * un-retimed. An entry is re-timed AT MOST ONCE: the standalone
    * number is the chosen measurement, so one that still exceeds the
    * threshold after its standalone re-time is a confirmed (explained)
    * slowdown, not a candidate for re-rolling until it looks fast.
    * Failed re-times (−1) keep the sweep entry but still count as
    * triaged. Terminates in ≤ |board| re-times, and TOTAL re-time
    * cost is additionally ceilinged at `maxRetimes`
    * ([[TriageMaxRetimes]]): a board with more over-threshold entries
    * than that is contention-condemned — the tail stays sweep-coupled
    * and the drift gate owns the refusal. Returns (final per-query
    * times, every standalone re-time taken — the record's `retimed`
    * field). Pure given `retime`, so CertCustodySpec pins the
    * fixpoint. */
  def triageFixpoint(cur: Map[String, Double], ref: Map[String, Double],
      retime: String => Double, threshold: Double = TriageThreshold,
      floorSec: Double = TriageFloorSec, cap: Int = TriageCap,
      maxRetimes: Int = TriageMaxRetimes)
      : (Map[String, Double], Map[String, Double]) = {
    var times = cur
    var retimed = Map.empty[String, Double]
    var continue = true
    while (continue && retimed.size < maxRetimes) {
      // already-retimed entries leave the candidate pool BEFORE the
      // cap ranks ratios — a confirmed-slow standalone reading must
      // not occupy the worst-20 slots and starve un-triaged entries
      // out of the batch (that would re-open the capped-pass hole)
      val batch = triageSet(times -- retimed.keys, ref,
        threshold, floorSec, cap)
        .take(maxRetimes - retimed.size)
      if (batch.isEmpty) continue = false
      else batch.foreach { n =>
        val t = retime(n)
        retimed += n -> t
        if (t >= 0) times += n -> t
      }
    }
    (times, retimed)
  }

  /** Drift-gate arithmetic (shared by BenchDriftSpec and [[decide]]'s
    * superset guard): the common-subset total ratio and the bound it
    * must stay under. The bound is [[DriftBound]] widened by the
    * records' mid-sentinel ratio — the measured host-speed factor —
    * capped at `normCap` (a run whose mid-sentinel drifted beyond
    * 1.5× is contamination, which the certifiability gate owns; the
    * normalization must never launder it). The factor only ever
    * WIDENS (max with 1): a faster current host does not tighten the
    * gate, it just leaves more headroom. Returns (ratio, bound);
    * ratio is NaN when no common queries exist. */
  def driftGate(curQ: Map[String, Double], prevQ: Map[String, Double],
      curMid: Option[Double], prevMid: Option[Double],
      normCap: Double = 1.5): (Double, Double) = {
    val common = curQ.keySet.intersect(prevQ.keySet).toSeq
      .filter(k => curQ(k) >= 0 && prevQ(k) >= 0)
    val ratio =
      if (common.isEmpty) Double.NaN
      else common.map(curQ).sum / common.map(prevQ).sum
    val host = (curMid, prevMid) match {
      case (Some(c), Some(p)) if p > 0 => math.min(math.max(1.0, c / p), normCap)
      case _ => 1.0
    }
    (ratio, DriftBound * host)
  }

  /** The keep/replace decision. `snapshots` is (round, record) for every
    * history snapshot; `inferredRound` is the current round (env or
    * artifact inference — advisory only); `cur` is the current run's
    * custody record (its `times`/`midMin` feed the superset guard).
    * Returns Some(roundToWrite) when the current run becomes the
    * standing record, None when the standing record keeps.
    *
    *  - same board as the newest same-board snapshot and NOT faster:
    *    keep, whatever round either run claims to be (the round-12 bug);
    *  - same board and faster: write at max(that snapshot's round,
    *    inferredRound) — the round's best, never regressing the
    *    snapshot numbering;
    *  - no same-board snapshot and the current board SHARES common
    *    queries with the newest snapshot's (grown, shrunk, or mixed
    *    add-and-retire — round-14 ADVICE: the strict-superset-only
    *    guard let a mixed-change contended run seed unconditionally):
    *    the common-subset total must pass [[driftGate]] against that
    *    snapshot, or the changed-board run is refused (round-13
    *    What's-wrong #3: a board change must not let a contended run
    *    seed the round's record — wait for a clean run);
    *  - otherwise (no usable common subset / first record): write at
    *    inferredRound — the record must cover the current registry. */
  def decide(snapshots: Seq[(Int, Record)], inferredRound: Int,
             cur: Record): Option[Int] =
    snapshots.filter(_._2.board == cur.board).sortBy(_._1).lastOption match {
      case Some((_, rec)) if rec.total <= cur.total => None
      case Some((r, _)) => Some(math.max(r, inferredRound))
      case None =>
        val newest = snapshots.sortBy(_._1).lastOption
        val gateOk = newest.forall { case (_, snap) =>
          val (ratio, bound) =
            driftGate(cur.times, snap.times, cur.midMin, snap.midMin)
          // NaN = no usable common subset (legacy snapshot without
          // per-query times, or disjoint boards): nothing to gate on
          ratio.isNaN || ratio <= bound
        }
        if (gateOk) Some(inferredRound) else None
    }
}
