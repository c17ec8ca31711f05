package graft

/** Bench-record custody: the board-keyed round's-best policy.
  *
  * Round-12 verdict What's-wrong #1: custody's round-inference let a
  * SLOWER same-board run displace the round's best record — the 23:01
  * 267.3 s run inferred "round 13" from the driver-written
  * BENCH_r12.json, found no r13 snapshot, and unconditionally replaced
  * bench_detail.json while the 231.2 s record sat in bench_history.
  * The fix: the keep/replace decision keys on the QUERY BOARD (the set
  * of query names), not the inferred round number — a run over the
  * same board as an existing snapshot must beat that snapshot's total
  * to become the standing record, regardless of which round either
  * belongs to. A board change (queries added/retired) always writes:
  * the record must cover the current registry.
  *
  * Round-12 ADVICE (low): the old comparison parsed the prior record
  * with a first-'"value":'-match and a count of ':' characters — the
  * record now carries explicit `n_queries` and `board` top-level
  * fields, and this parser prefers them (falling back to deriving the
  * board from the queries-map keys for pre-round-13 snapshots, whose
  * keys are full query names matching `[a-z0-9_]+`).
  *
  * Kept free of Spark/file-system state so CertCustodySpec can pin the
  * displacement rule directly.
  */
object BenchCustody {

  /** The custody-relevant slice of a bench_detail record. */
  final case class Record(total: Double, nQueries: Int, board: String,
                          certifiable: Boolean)

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
    val keys: Seq[String] =
      """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt).map(_.group(1)) match {
        case Some(qm) => """"([^"]+)":""".r.findAllMatchIn(qm).map(_.group(1)).toSeq
        case None => return None
      }
    val board = """"board":"([0-9a-f]+)"""".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse(boardHash(keys))
    val n = """"n_queries":(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt).getOrElse(keys.size)
    Some(Record(total, n, board, !txt.contains("\"certifiable\":false")))
  }

  /** Extract the round number from a snapshot file name, for NUMERIC
    * ordering (round-12 ADVICE: lexicographic sort misorders r100 vs
    * r99 once the pad overflows). */
  def roundOf(fileName: String): Option[Int] =
    """bench_detail_r(\d+)\.json""".r.findFirstMatchIn(fileName)
      .map(_.group(1).toInt)

  /** The keep/replace decision. `snapshots` is (round, record) for every
    * history snapshot; `inferredRound` is the current round (env or
    * artifact inference — advisory only). Returns Some(roundToWrite)
    * when the current run becomes the standing record, None when the
    * standing record keeps.
    *
    *  - same board as the newest same-board snapshot and NOT faster:
    *    keep, whatever round either run claims to be (the round-12 bug);
    *  - same board and faster: write at max(that snapshot's round,
    *    inferredRound) — the round's best, never regressing the
    *    snapshot numbering;
    *  - no same-board snapshot (board grew/shrank): write at
    *    inferredRound — the record must cover the current registry. */
  def decide(snapshots: Seq[(Int, Record)], inferredRound: Int,
             total: Double, board: String): Option[Int] =
    snapshots.filter(_._2.board == board).sortBy(_._1).lastOption match {
      case Some((_, rec)) if rec.total <= total => None
      case Some((r, _)) => Some(math.max(r, inferredRound))
      case None => Some(inferredRound)
    }
}
