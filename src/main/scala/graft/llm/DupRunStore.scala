package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** The PERSISTED ExactSubstr duplicated-run catalog + the span CUT —
  * round-15's answer to the round-14 verdict's two Missing items: the
  * run family (q413–q417) was the only dedup family whose state was
  * recomputed per query, and the suite had the census/planner/
  * classifier for the Lee et al. 2022 substring cut but never the cut
  * itself. Three pieces:
  *
  *  - the SERVE store ([[catalogSites]]): one seed-if-absent
  *    derivation persists the committed-cut run-site table (doc_id,
  *    source, start_tok, run_tokens, run_fp); q414 (contamination
  *    screen), q415 (removal census), q419 (catalog serve) and q420
  *    (the cut) all read the parquet store instead of re-running the
  *    corpus-token-volume extraction — their unchanged
  *    from-first-principles oracles double as staleness guards;
  *  - the MAINTENANCE contract (q418): the catalog is maintained
  *    INCREMENTALLY under snapshot appends as signed delta rows,
  *    including the genuinely hard part — RETROACTIVE run creation:
  *    a new document can flip a shingle's corpus df from 1 to ≥ 2,
  *    making positions in OLD documents duplicated and creating,
  *    extending, or merging runs in text that arrived generations ago
  *    (the q283 retraction pattern applied to positional state).
  *    Deltas derive from the persisted positional-postings state and
  *    the stored token arrays of AFFECTED docs only — never a rescan
  *    of prior generations at corpus width;
  *  - the CUT (q420, [[removalSpans]] + [[applySpanRemoval]]): the transform the
  *    family exists to decide — keep each duplicated run's FIRST site
  *    (min (doc_id, start_tok) per run_fp), strip every other
  *    occurrence's token positions, reconstruct the cleaned corpus
  *    (Lee et al., "Deduplicating Training Data Makes Language Models
  *    Better", 2022 — the ExactSubstr operation). q415's census is
  *    the exactness oracle: covered = removed ⊎ keep-only positions
  *    (DupRunStoreSpec pins the identity).
  *
  * Scale shape: the catalog store is qualifying-runs-sized (≥ 20
  * tokens — tiny against the corpus); maintenance work per generation
  * is bounded by the new generation's volume plus the positions of
  * crossing shingles (a 1→2 crosser has exactly ONE prior holder, so
  * affected-old-doc volume is ≤ the new generation's shingle count);
  * the cut ships removal INTERVALS (runs-sized, never token-mass
  * exploded) and the text rebuild is one gap-slicing fold per doc —
  * O(|toks| + runs), linear even for a long doc that is mostly
  * duplicated text (round-16; the prior position-set filter was
  * O(|toks| × |removed|) on exactly that pathological shape).
  *
  * Reference behavior: the derived-state persistence stance mirrors
  * the reference's own state files (drift_detector.py:43-45,
  * self_healing_agent.py:122); the operators extend SURVEY.md §2's
  * LLM-ops dedup family.
  */
object DupRunStore {

  import TextDedup.DupRunMinTokens

  // ---------------------------------------------------------------
  // serve store (seed-once committed catalog)
  // ---------------------------------------------------------------

  private def seedCatalog(s: SparkSession, dir: String,
      minTokens: Int): String = {
    // the serve path is KEYED BY THE THRESHOLD (round-15 verdict
    // Next #6): an operator acting on the q416 planner's curve and
    // re-running at a new cut must never be served the old cut's
    // catalog — each threshold seeds its own store (and stays live:
    // two thresholds in flight are two different catalogs, not a
    // staleness relation; within one threshold the content tag still
    // guards fixture regeneration)
    val path = StateStores.servePath(dir, s"dup_run_t${minTokens}_v1",
      "documents")
    StateStores.seedOnce(path) {
      TextDedup.dupRunSites(s, dir, minTokens)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** The stored run-site rows (doc_id, source, start_tok, run_tokens,
    * run_fp) at the given cut — default: the committed
    * [[TextDedup.DupRunMinTokens]]. */
  private[graft] def catalogSites(s: SparkSession, dir: String,
      minTokens: Int = DupRunMinTokens): DataFrame =
    s.read.parquet(seedCatalog(s, dir, minTokens))

  // ---------------------------------------------------------------
  // q418: incremental maintenance with retroactive run creation
  // ---------------------------------------------------------------

  private val RunKey = Seq("doc_id", "source", "start_tok", "run_tokens", "run_fp")

  /** Signed run-catalog deltas for generation `gen`, derived from the
    * persisted STATE alone (positional postings + the stored token
    * arrays of affected docs — the spec pins that no document text
    * outside the state store is scanned):
    *
    *  - AFFECTED docs = the new generation's docs ∪ every OLD doc
    *    holding a position whose shingle's cumulative df crosses
    *    1 → ≥ 2 at this generation (the only event that can change an
    *    old doc's duplicated-position set — df never decreases, and a
    *    shingle already at df ≥ 2 stays there);
    *  - CREDITS: +1 per run site of an affected doc, recomputed from
    *    the duplicated-position streaks under the cumulative df;
    *  - RETRACTIONS: −1 per previously-catalogued site of an affected
    *    doc (the net of the delta log) — a crosser can EXTEND or MERGE
    *    an old doc's runs, so its old rows must be debited before the
    *    recomputed rows land (drop this and the maintained catalog
    *    permanently disagrees with a rebuild on every doc whose run
    *    grew after it was first catalogued).
    *
    * Unaffected docs are never touched: their duplicated-position set
    * is provably invariant, which is what bounds maintenance work at
    * snapshot volume instead of corpus volume.
    *
    * Returns the delta frame plus an unpersist thunk for the two
    * cached intermediates (df state, affected-doc set) — the caller
    * runs it after the deltas' write action (round-15 ADVICE: the
    * stream sink calls this once per micro-batch for the stream's
    * lifetime, so un-released cached relations accumulate until LRU
    * pressure). */
  private[graft] def runIvmDeltas(s: SparkSession, statePath: String,
      gen: Int): (DataFrame, () => Unit) = {
    val post = s.read.parquet(s"$statePath/postings")
    // BOTH df states (before/after this generation) from ONE pass
    // (the q283 round-11 lesson: a second df groupBy re-scans state)
    val dfs = post.filter(col("gen") <= gen)
      .groupBy(col("sh")).agg(count(lit(1)).as("dfA"),
        count_if(col("gen") < gen).as("dfB")).cache()
    // EXPLICIT read schema: a prior generation with ZERO qualifying
    // runs leaves an empty partition set (bare _SUCCESS, or a
    // part-less gen= dir from the stream sink) — schema inference
    // would fail on it, while nothing-to-retract is the correct
    // reading; the declared schema makes the empty log read as an
    // empty frame instead of an error (DupRunStoreSpec pins the
    // empty-seed lifecycle)
    val prior = if (gen == 0) None else Some(s.read.schema(
        "doc_id BIGINT, source STRING, start_tok INT, " +
          "run_tokens BIGINT, run_fp STRING, delta BIGINT, gen INT")
      .parquet(s"$statePath/deltas"))
    val (deltas, done) = runIvmDeltasFrom(
      post, s.read.parquet(s"$statePath/docs"), prior, dfs, gen)
    (deltas, () => { dfs.unpersist(); done() })
  }

  /** [[runIvmDeltas]] with the STATE frames supplied by the caller —
    * the demo lifecycles pass the one cached corpus derivation (and
    * the per-gen delta frames they just wrote) instead of re-reading
    * the parquet they wrote moments earlier; the content is identical
    * by construction (the writes are deterministic projections of
    * these very frames), the written bytes stay the store of record,
    * and the stream/maintenance wrapper above still reads persisted
    * state only. `dfs` carries (sh, dfA, dfB) for THIS generation —
    * the wrapper derives it per call, the demos slice one fused
    * all-generations count pass. */
  private[graft] def runIvmDeltasFrom(post: DataFrame, docsAll: DataFrame,
      prior: Option[DataFrame], dfs: DataFrame,
      gen: Int): (DataFrame, () => Unit) = {
    val crossers = dfs.filter(col("dfB") < 2 && col("dfA") >= 2)
      .select(col("sh"))
    val affectedOld = post.filter(col("gen") < gen)
      .join(crossers.hint("shuffle_hash"), Seq("sh"), "left_semi")
      .select(col("doc_id"))
    val affected = post.filter(col("gen") === gen).select(col("doc_id"))
      .union(affectedOld).distinct().cache()
    // recompute affected docs' runs from the updated duplicated flags
    val dupPos = post.filter(col("gen") <= gen)
      .join(affected.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
      .join(dfs.filter(col("dfA") >= 2).select(col("sh"))
        .hint("shuffle_hash"), Seq("sh"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val runs = dupPos.withColumn("rk", row_number().over(w))
      .groupBy(col("doc_id"), (col("i") - col("rk")).as("grp"))
      .agg(min(col("i")).as("i0"), count(lit(1)).as("len_sh"))
      .filter(col("len_sh") + 2 >= DupRunMinTokens)
      .select(col("doc_id"), (col("i0") + 1).as("start_tok"),
        (col("len_sh") + 2).as("run_tokens"))
    // run-text fetch-back against the STORED token arrays, affected-
    // restricted (never the corpus); small run table as build side
    val docsStore = docsAll
      .filter(col("gen") <= gen)
      .join(affected.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
    val credits = runs.hint("shuffle_hash").join(docsStore, "doc_id")
      .select(col("doc_id"), col("source"), col("start_tok"),
        col("run_tokens"),
        substring(sha2(expr(
          "concat_ws(' ', slice(toks, start_tok, cast(run_tokens AS int)))"),
          256), 1, 16).as("run_fp"),
        lit(1L).as("delta"))
    val cleanup = () => { affected.unpersist(); () }
    prior match {
      case None => (credits, cleanup)
      case Some(pr) =>
        val retracts = pr
          .filter(col("gen") < gen)
          .join(affected.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
          .groupBy(RunKey.map(col): _*)
          .agg(sum(col("delta")).as("net")).filter(col("net") > 0)
          .select(RunKey.map(col) :+ lit(-1L).as("delta"): _*)
        (credits.union(retracts), cleanup)
    }
  }

  /** The per-generation doc state: token arrays + positional shingle
    * postings, the inputs [[runIvmDeltas]] maintains from. Postings
    * positions are the 0-based posexplode index (runs convert to
    * 1-based start_tok, matching [[TextDedup.dupRunSitesOf]]). */
  private def genState(genDocs: DataFrame): (DataFrame, DataFrame) = {
    graft.functions.ShingleHashes.register(genDocs.sparkSession)
    val docsArr = genDocs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val postings = docsArr.select(col("doc_id"),
      expr("posexplode(shingle_hashes_all(toks, 3))").as(Seq("i", "sh")))
    (docsArr, postings)
  }

  /** ONE cached corpus-wide derivation feeding every demo lifecycle
    * phase (the q283 round-11 lesson, measured there at 2× the whole
    * query's cost: per-step re-derivation re-scans and re-explodes
    * identical text once per generation), plus the round-17
    * orchestration cut: these queries' cost was ~70 serialized
    * ~0.15 s stage-jobs, pure job-count, so the demo now derives and
    * writes a RANGE of generations as ONE action per store instead of
    * one action chain per generation. Identical bytes land on disk
    * (one `partitionBy("gen")` write of the same per-gen rows), and
    * every stage inside the single action schedules concurrently.
    *
    * The per-generation rows are computed exactly as the ORACLE
    * defines them (duckRunIvm's pc/rc CTEs — the from-first-principles
    * statement of the maintenance contract):
    *
    *  - credits(g)  = snapshot-g     runs of docs affected at g, +1;
    *  - retracts(g) = snapshot-(g−1) runs of docs affected at g, −1.
    *
    * The sequential maintenance path ([[runIvmDeltas]], unchanged and
    * still what the stream twin runs) computes retractions by NETTING
    * the prior delta log; the two are equal row-for-row by the
    * maintained ≡ rebuilt induction the oracle pins at every
    * generation (a doc not affected at h has an identical run set at
    * h and h−1, so the net of a doc's log rows below g IS its
    * snapshot-(g−1) run set) — which is why the oracle's own rc CTE
    * counts retractions this way. Freeing retractions from the log
    * read makes every generation's deltas derivable in parallel from
    * the cached corpus frames.
    *
    * `write(lo, hi)` persists generations lo..hi (docs ‖ postings ‖
    * deltas, three overlapped write actions, §2.6 — no coalesce; AQE
    * right-sizes output files, the round-9 lesson); `log()` is the
    * union of the written delta frames (identical rows to the on-disk
    * log by construction). */
  private final case class DemoLifecycle(write: (Int, Int) => Unit,
      done: () => Unit, arrGen: DataFrame, posGen: DataFrame,
      log: () => DataFrame, runsAt: Int => DataFrame) {
    def arr: DataFrame = arrGen.drop("gen")
    def pos: DataFrame = posGen.drop("gen")
  }

  private def demoLifecycle(s: SparkSession, docs: DataFrame,
      statePath: String): DemoLifecycle = {
    graft.functions.ShingleHashes.register(s)
    val arrAll = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .withColumn("gen", pmod(col("doc_id"), lit(3)).cast("int")).cache()
    val posAll = arrAll.select(col("doc_id"), col("gen"),
      expr("posexplode(shingle_hashes_all(toks, 3))").as(Seq("i", "sh"))).cache()
    // one materialization populates BOTH caches (posAll reads through
    // arrAll's InMemoryRelation) before the parallel writes below —
    // otherwise the writes race the unpopulated arrAll and each re-run
    // the corpus scan+split, which on a CPU-saturated config costs the
    // full derivation per racer (the q413 x100 finding)
    posAll.count()
    // ONE corpus-wide df pass covering every generation watermark (the
    // old per-step dfs groupBy re-aggregated the same cached postings
    // once per generation): watermark G's df is c_G
    val dfAll = posAll.groupBy(col("sh")).agg(
      count_if(col("gen") <= 0).as("c0"),
      count_if(col("gen") <= 1).as("c1"),
      count(lit(1)).as("c2")).cache()
    // affected docs for EVERY generation in one pass: own-gen docs
    // plus, for g ≥ 1, docs holding a position (gen < g) of a shingle
    // whose df crosses 1 → ≥ 2 at g. A shingle crosses at most once
    // (df is monotone), so the two whens are exclusive.
    val crossSh = dfAll.select(col("sh"), explode(array(
        when(col("c0") < 2 && col("c1") >= 2, 1),
        when(col("c1") < 2 && col("c2") >= 2, 2))).as("g"))
      .filter(col("g").isNotNull)
    val affAll = posAll.select(col("doc_id"), col("gen").as("g"))
      .union(posAll.join(crossSh.hint("shuffle_hash"), Seq("sh"))
        .filter(col("gen") < col("g")).select(col("doc_id"), col("g")))
      .distinct().cache()
    affAll.count() // materializes dfAll too (single consumer, no race)
    def aff(g: Int): DataFrame =
      affAll.filter(col("g") === g).select(col("doc_id"))
    // ALL THREE watermarks' run catalogs from ONE window pass: the
    // duplicated-position sets are NESTED (gen ≤ wm grows with wm and
    // df is monotone, so S0 ⊆ S1 ⊆ S2) — one sort per doc over S2
    // carries three running counts, each equal to the row_number a
    // per-watermark window would produce over its own subset, so the
    // per-watermark streak keys (i − rk_wm) fall out of the same
    // WindowExec. Restricting docs before or after the streak pass is
    // equivalent (streaks are per-doc), so the credit/retract doc-set
    // restriction moves AFTER this shared derivation. One fetch-back
    // join computes every run_fp. Five window passes (credits ×3,
    // retracts ×2, plus the rebuild's own) collapse into this one.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val marked = posAll
      .join(dfAll.filter(col("c2") >= 2).hint("shuffle_hash"), Seq("sh"))
      .select(col("doc_id"), col("i"),
        (col("gen") <= 0 && col("c0") >= 2).as("in0"),
        (col("gen") <= 1 && col("c1") >= 2).as("in1"))
    val rked = marked.select(col("doc_id"), col("i"), col("in0"), col("in1"),
      sum(when(col("in0"), 1L)).over(w).as("rk0"),
      sum(when(col("in1"), 1L)).over(w).as("rk1"),
      sum(lit(1L)).over(w).as("rk2"))
    val runsAll = rked.select(col("doc_id"), col("i"), explode(array(
        when(col("in0"), struct(lit(0).as("wm"), (col("i") - col("rk0")).as("grp"))),
        when(col("in1"), struct(lit(1).as("wm"), (col("i") - col("rk1")).as("grp"))),
        struct(lit(2).as("wm"), (col("i") - col("rk2")).as("grp")))).as("e"))
      .filter(col("e").isNotNull)
      .groupBy(col("doc_id"), col("e.wm").as("wm"), col("e.grp").as("grp"))
      .agg(min(col("i")).as("i0"), count(lit(1)).as("len_sh"))
      .filter(col("len_sh") + 2 >= DupRunMinTokens)
      .select(col("doc_id"), col("wm"), (col("i0") + 1).as("start_tok"),
        (col("len_sh") + 2).as("run_tokens"))
    // run-text fetch-back against the stored token arrays — once for
    // every watermark's catalog; small run table as build side
    val runsFp = runsAll.hint("shuffle_hash").join(arrAll, "doc_id")
      .select(col("doc_id"), col("wm"), col("source"), col("start_tok"),
        col("run_tokens"),
        substring(sha2(expr(
          "concat_ws(' ', slice(toks, start_tok, cast(run_tokens AS int)))"),
          256), 1, 16).as("run_fp")).cache()
    runsFp.count()
    def runsAt(wm: Int): DataFrame =
      runsFp.filter(col("wm") === wm).drop("wm")
    def sites(wm: Int, g: Int, delta: Long): DataFrame =
      runsAt(wm).join(aff(g).hint("shuffle_hash"), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"), col("start_tok"),
          col("run_tokens"), col("run_fp"), lit(delta).as("delta"))
    def deltasFor(g: Int): DataFrame = {
      val credits = sites(g, g, 1L)
      if (g == 0) credits else credits.union(sites(g - 1, g, -1L))
    }
    val written = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val write = (lo: Int, hi: Int) => {
      val mode = if (lo == 0) "overwrite" else "append"
      val dAll = (lo to hi).map(g => deltasFor(g).withColumn("gen", lit(g)))
        .reduce(_.union(_)).cache()
      written += dAll
      StateStores.inParallel(
        () => arrAll.filter(col("gen").between(lo, hi))
          .write.mode(mode).partitionBy("gen").parquet(s"$statePath/docs"),
        () => posAll.filter(col("gen").between(lo, hi))
          .write.mode(mode).partitionBy("gen").parquet(s"$statePath/postings"),
        () => dAll
          .write.mode(mode).partitionBy("gen").parquet(s"$statePath/deltas"))
    }
    val done = () => { arrAll.unpersist(); posAll.unpersist()
      dfAll.unpersist(); affAll.unpersist(); runsFp.unpersist()
      written.foreach(_.unpersist()); () }
    DemoLifecycle(write, done, arrAll, posAll,
      () => written.reduce(_.union(_)), runsAt)
  }

  /** STREAMING twin of the batch maintenance step (the live
    * maintenance path every
    * persisted store in this repo carries): one micro-batch's doc
    * state, postings, and signed deltas, written REPLAY-IDEMPOTENTLY —
    * each batch Overwrites its OWN `gen=<batchId>` partition dirs (the
    * bandIndexAppendSink stance), so an at-least-once foreachBatch
    * replay rewrites identical deterministic bytes instead of
    * double-appending. The delta derivation is [[runIvmDeltas]]
    * UNCHANGED — it reads the postings state including this batch's
    * just-written generation, so retroactive run creation in old docs
    * fires from the stream exactly as in batch maintenance
    * (DupRunStreamSpec pins maintained ≡ rebuilt across batches and
    * across a kill/restart between the sink write and the streaming
    * commit). */
  private[graft] def runIvmStreamStep(s: SparkSession, batchDocs: DataFrame,
      statePath: String, gen: Int): Unit = {
    val (docsArr, postings) = genState(batchDocs)
    StateStores.inParallel( // independent paths, §2.6 overlap
      () => docsArr.write.mode("overwrite").parquet(s"$statePath/docs/gen=$gen"),
      () => postings.write.mode("overwrite")
        .parquet(s"$statePath/postings/gen=$gen"))
    val (deltas, done) = runIvmDeltas(s, statePath, gen)
    try deltas.write.mode("overwrite").parquet(s"$statePath/deltas/gen=$gen")
    finally done()
  }

  /** Compact the run-IVM state at `watermark` (the q321/q322
    * lifecycle step, run-store flavor): fold every delta generation
    * ≤ watermark into ONE net base generation (rows with net ≤ 0 drop
    * — a retracted site costs nothing forever after) and collapse the
    * postings AND doc-array partitions to a single `gen = watermark`.
    * Semantics-preserving for every later [[runIvmStep]] by
    * construction: the delta derivation reads state only through
    * `gen <= g` / `gen < g` / `gen === g` predicates and compacted
    * gen = watermark < any future g; df is a plain row count that
    * re-labeling cannot change; and the affected-doc recompute reads
    * token arrays by doc_id, not by generation. Same head-only guard
    * as the pair store: a watermark below the newest generation would
    * silently destroy later generations. */
  private[graft] def runStoreCompact(s: SparkSession, statePath: String,
      watermark: Int): Unit =
    runStoreCompactFrom(s, statePath, watermark, None, None, None)

  /** [[runStoreCompact]] with the fold/collapse INPUTS optionally
    * supplied from the caller's cached frames (the q421 demo: the
    * postings/docs/delta content being folded was derived and written
    * by this same invocation moments earlier, so re-reading it from
    * parquet is a redundant corpus-sized scan). The REWRITES are
    * unchanged — every swap still lands real bytes under the store
    * lock — and the auto-compact / stream path passes None and reads
    * persisted state. Netting the raw delta frames equals netting the
    * on-disk log by construction (same rows). */
  private[graft] def runStoreCompactFrom(s: SparkSession, statePath: String,
      watermark: Int, memDeltas: Option[DataFrame],
      memPost: Option[DataFrame], memDocs: Option[DataFrame]): Unit = {
    StateStores.headGuard(StateStores.genDirs(s"$statePath/deltas"), watermark, "deltas")
    val folded = memDeltas.getOrElse(s.read.parquet(s"$statePath/deltas"))
      .filter(col("gen") <= watermark)
      .groupBy(RunKey.map(col): _*)
      .agg(sum(col("delta")).as("delta"))
      .filter(col("delta") > 0)
      .withColumn("gen", lit(watermark))
    // the three rewrites read and swap DISJOINT subdirs (deltas fold,
    // postings collapse, docs collapse) — overlap them (§2.6); each
    // swap still runs under its own per-path store lock
    StateStores.inParallel(
      (() => StateStores.rewriteSwap(folded, s"$statePath/deltas",
        Some("gen"))) +:
      Seq("postings" -> memPost, "docs" -> memDocs).map { case (sub, mem) =>
        () => StateStores.rewriteSwap(
          mem.getOrElse(s.read.parquet(s"$statePath/$sub"))
            .filter(col("gen") <= watermark)
            .withColumn("gen", lit(watermark)),
          s"$statePath/$sub", Some("gen"))
      }: _*)
  }

  /** Auto-compaction hook for the LIVE sink — the PairGraph
    * autoCompactIfFragmented rule verbatim: fold at the committed
    * head (every generation < `currentGen` is streaming-committed),
    * but only when no generation dir ≥ `currentGen` exists (such a
    * dir is a crashed uncommitted attempt of this very batch — the
    * replay is about to Overwrite it, and folding it would read torn
    * parquet). Skipping is safe: the next clean batch compacts. */
  private[graft] def autoCompactIfFragmented(s: SparkSession,
      statePath: String, currentGen: Int, every: Int = 10): Boolean =
    StateStores.foldAtCommittedHead(
      Seq("deltas", "postings", "docs")
        .flatMap(sub => StateStores.genDirs(s"$statePath/$sub")),
      currentGen, every)(runStoreCompact(s, statePath, _))

  /** Direct DATA-TERM volumes for the q421 compact (the
    * graft.VolumeCheck q218/q413 treatment, round-15 verdict Next #3):
    * seed the first two generations of the demo lifecycle into a
    * scratch state dir, then count exactly what the watermark-1
    * compact folds/rewrites — delta-log rows, postings rows, stored
    * doc-array rows. If these are linear in corpus scale, q421's
    * residual above 1.0 is a constant class (job-orchestration +
    * log factors), not a plan term. */
  private[graft] def compactInputVolumes(s: SparkSession, dir: String)
      : (Long, Long, Long) = {
    val path = StateStores.statePath(dir, "dup_run_vol")
    val lc = demoLifecycle(s, Tables(s, dir, "documents"), path)
    lc.write(0, 1)
    lc.done()
    (s.read.parquet(s"$path/deltas").count(),
      s.read.parquet(s"$path/postings").count(),
      s.read.parquet(s"$path/docs").count())
  }

  // ---------------------------------------------------------------
  // q420: the ExactSubstr cut
  // ---------------------------------------------------------------

  /** The run sites the cut REMOVES, as 1-based token INTERVALS
    * (doc_id, start_tok, run_tokens): every site except each run_fp's
    * first (min (doc_id, start_tok)) keep site. Intervals of one doc
    * can overlap (adjacent maximal runs share ≤ 2 boundary tokens);
    * [[applySpanRemoval]]'s gap fold handles that without a dedup.
    * The per-run_fp window partitions the catalog-sized site table,
    * never the corpus. */
  private[graft] def removalSpans(sites: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("run_fp")).orderBy(col("doc_id"), col("start_tok"))
    sites.withColumn("rk", row_number().over(w)).filter(col("rk") > 1)
      .select(col("doc_id"), col("start_tok"), col("run_tokens"))
  }

  /** Apply removal INTERVALS (doc_id, start_tok, run_tokens — 1-based,
    * overlap-tolerant) to a docs frame: rebuild each doc's text from
    * the GAPS between its sorted intervals, carrying the removed-token
    * count. One `aggregate` fold per doc over its runs-sized interval
    * array, each step slicing the next surviving gap — O(|toks| +
    * |intervals|) per doc (round-15 verdict What's-wrong #1: the old
    * per-token `array_contains` scan over a position SET was
    * O(|toks| × |removed|), quadratic for exactly the pathological
    * doc the cut exists for — a long doc that is mostly duplicated
    * text). A contained or overlapping interval just advances the
    * `nxt` cursor without emitting a gap, so no interval merge pass
    * is needed. */
  private[llm] def applySpanRemoval(docs: DataFrame, spans: DataFrame)
      : DataFrame = {
    val rem = spans.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(
        col("start_tok").cast("int").as("s"),
        (col("start_tok") + col("run_tokens") - 1).cast("int").as("e"))))
        .as("iv"))
    docs.withColumn("toks", split(col("text"), " "))
      // removal side is docs-hit-sized but unbounded at corpus scale:
      // shuffle_hash, never a broadcast Catalyst can misprice
      .join(rem.hint("shuffle_hash"), Seq("doc_id"), "left")
      .withColumn("kept", when(col("iv").isNull, col("toks"))
        .otherwise(expr(
          """aggregate(iv,
            |  named_struct('nxt', 1, 'acc', cast(array() AS array<string>)),
            |  (st, x) -> named_struct(
            |    'nxt', greatest(st.nxt, x.e + 1),
            |    'acc', if(x.s > st.nxt,
            |      concat(st.acc, slice(toks, st.nxt, x.s - st.nxt)), st.acc)),
            |  st -> if(st.nxt <= size(toks),
            |    concat(st.acc, slice(toks, st.nxt, size(toks) - st.nxt + 1)),
            |    st.acc))""".stripMargin)))
      // coalesce both sizes: a null-text doc (toks = kept = NULL —
      // possible when a caller feeds an unfiltered frame) must read
      // n_removed = 0, not NULL
      .withColumn("n_removed",
        (coalesce(size(col("toks")), lit(0)) -
          coalesce(size(col("kept")), lit(0))).cast("long"))
      .withColumn("text", when(col("iv").isNull, col("text"))
        .otherwise(array_join(col("kept"), " ")))
      .drop("toks", "iv", "kept")
  }

  /** Maximal BENCHMARK-OVERLAPPING runs inside `train` docs: streaks
    * of train token positions whose 3-shingle occurs ANYWHERE in
    * `bench`, ≥ `minTokens` long — the q413 streak machinery with the
    * duplicated-flag predicate swapped for bench membership. Strictly
    * stronger than run_fp equality for contamination: a bench span
    * EMBEDDED inside a longer train-side duplicated run hashes to a
    * different maximal-run fp (the q414 blind spot), but its positions
    * still carry bench shingles, so the streak finds exactly the
    * shared extent. Returns (doc_id, start_tok, run_tokens); maximal
    * streaks of one predicate are DISJOINT per doc, so run_tokens sums
    * are exact masses (no q415-style position dedup needed). Scale:
    * the bench shingle set is eval-set-sized (broadcastable in
    * practice, shuffle_hash-pinned for the 100 TB posture); the probe
    * volume is the train corpus's token count, hashes on the wire. */
  private def shinglePositions(d: DataFrame): DataFrame = {
    graft.functions.ShingleHashes.register(d.sparkSession)
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        expr("posexplode(shingle_hashes_all(toks, 3))").as(Seq("i", "sh")))
  }

  /** The distinct 3-shingle hash set of a benchmark frame — the probe
    * side every membership-streak screen joins against. */
  private def benchShinglesOf(bench: DataFrame): DataFrame =
    shinglePositions(bench).select(col("sh")).distinct()

  private[graft] def benchOverlapSites(train: DataFrame, bench: DataFrame,
      minTokens: Int = DupRunMinTokens): DataFrame =
    overlapSitesAgainst(train, benchShinglesOf(bench), minTokens)

  /** [[benchOverlapSites]] with the bench side PRE-DERIVED — a
    * single-column (`sh`) shingle-hash set, typically the persisted
    * [[evalShingleStore]] — so the screen probes the train corpus
    * against a store read instead of re-exploding the eval slice
    * per run (round-15 verdict Next #8). */
  private[graft] def overlapSitesAgainst(train: DataFrame, bsh: DataFrame,
      minTokens: Int): DataFrame = {
    val hit = shinglePositions(train)
      .join(bsh.hint("shuffle_hash"), Seq("sh"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    hit.withColumn("rk", row_number().over(w))
      .groupBy(col("doc_id"), (col("i") - col("rk")).as("grp"))
      .agg(min(col("i")).as("i0"), count(lit(1)).as("len_sh"))
      .filter(col("len_sh") + 2 >= minTokens)
      .select(col("doc_id"), (col("i0") + 1).as("start_tok"),
        (col("len_sh") + 2).as("run_tokens"))
  }

  /** Seed-once PERSISTED eval-slice shingle set (round-15 verdict
    * Next #8): the q82-convention benchmark slice (doc_id % 50 == 0)
    * is STATIC per corpus, yet q422 and the CurationMain span-strip
    * stage each re-derived its posexplode per run. One eval-sized
    * store (single `sh` column) turns every screen into a
    * single-sided probe of the train corpus. Maintenance is not a
    * meaningful axis here — the eval set changes only when the corpus
    * fixture does, and the servePath content tag already forces a
    * reseed then; the screens' from-first-principles oracles
    * (q422's DuckDB twin recomputes the slice's shingles) double as
    * the staleness guard, the q419 stance. */
  private[graft] def evalShingleStore(s: SparkSession, dir: String)
      : DataFrame = {
    val path = StateStores.servePath(dir, "eval_shingle_v1", "documents")
    StateStores.seedOnce(path) {
      benchShinglesOf(
        Tables(s, dir, "documents").filter(col("doc_id") % 50 === 0))
        .write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path)
  }

  // ---------------------------------------------------------------
  // eval-shingle LOG maintenance (the store's live-twin path)
  // ---------------------------------------------------------------

  /** One maintenance step of the generation-partitioned eval-shingle
    * LOG under snapshot appends — the live-twin counterpart of the
    * seed-once [[evalShingleStore]] (the q82 eval slice GROWS with
    * the corpus: every appended snapshot lands new doc_id % 50 == 0
    * benchmark docs, so a long-running screen's probe set must be
    * maintained, not just seeded). Each batch Overwrites its OWN
    * `gen=<id>` dir with the batch slice's distinct shingle hashes —
    * deterministic bytes, so an at-least-once replay converges (the
    * bandIndexAppendSink stance). SET semantics make this the
    * simplest store in the repo: shingles are never retracted from an
    * append-only eval set, so no signed deltas, no affected-set
    * recompute — just per-gen distinct contributions. */
  private[graft] def evalShingleStep(batchDocs: DataFrame,
      statePath: String, gen: Int): Unit =
    benchShinglesOf(batchDocs.filter(col("doc_id") % 50 === 0))
      .write.mode("overwrite").parquet(s"$statePath/gen=$gen")

  /** Serve the maintained eval-shingle set: distinct over generations
    * (the same shingle can arrive in several snapshots' eval docs).
    * Declared schema so a part-less generation dir (a batch with NO
    * eval-slice docs writes an empty commit) reads as empty instead
    * of failing inference. */
  private[graft] def evalShinglesServe(s: SparkSession, statePath: String)
      : DataFrame =
    s.read.schema("sh BIGINT, gen INT").parquet(statePath)
      .select(col("sh")).distinct()

  /** Compact the eval-shingle log at `watermark`: fold every
    * generation ≤ watermark into ONE distinct base generation, under
    * the shared [[StateStores.headGuard]]. Semantics-preserving because the serve
    * is a distinct over `gen` partitions and folded gen = watermark <
    * any future generation id. */
  private[graft] def evalShingleCompact(s: SparkSession, statePath: String,
      watermark: Int): Unit = {
    StateStores.headGuard(StateStores.genDirs(statePath), watermark, "shingles")
    StateStores.rewriteSwap(
      s.read.schema("sh BIGINT, gen INT").parquet(statePath)
        .filter(col("gen") <= watermark)
        .select(col("sh")).distinct()
        .withColumn("gen", lit(watermark)),
      statePath, Some("gen"))
  }

  /** The shared [[StateStores.foldAtCommittedHead]] cadence rule applied to the
    * single-log eval-shingle store. */
  private[graft] def evalShingleAutoCompact(s: SparkSession,
      statePath: String, currentGen: Int, every: Int = 10): Boolean =
    StateStores.foldAtCommittedHead(StateStores.genDirs(statePath),
      currentGen, every)(
      evalShingleCompact(s, statePath, _))

  /** Cross-set span DECONTAMINATION — the q414/q422 screen turned
    * into removal predicates (round-14 verdict Next #8): every
    * ≥ [[TextDedup.DupRunMinTokens]]-token maximal run of
    * benchmark-occurring shingles is stripped from the TRAIN side
    * only; the benchmark is never modified. Built on
    * [[benchOverlapSites]], so bench spans EMBEDDED in longer
    * train-side duplicated runs are caught too (run_fp equality
    * misses them). Shorter-than-span leaks remain the n-gram
    * doc-drop stage's job — the strip salvages, the drop guarantees. */
  private[graft] def stripSharedSpans(train: DataFrame, benchmark: DataFrame,
      minTokens: Int = DupRunMinTokens): DataFrame =
    // maximal single-predicate streaks are disjoint per doc, so the
    // sites feed the interval rebuild directly
    applySpanRemoval(train, benchOverlapSites(train, benchmark, minTokens))

  /** [[stripSharedSpans]] against the PERSISTED eval-slice shingle
    * store of `dir` — the CurationMain stage-4a form: the strip is a
    * single-sided probe of the (already-filtered) train frame, the
    * eval side a store read. */
  private[graft] def stripSharedSpansServed(s: SparkSession, dir: String,
      train: DataFrame, minTokens: Int = DupRunMinTokens): DataFrame =
    applySpanRemoval(train,
      overlapSitesAgainst(train, evalShingleStore(s, dir), minTokens))

  /** The within-corpus ExactSubstr cut as a reusable transform (the
    * CurationMain stage): keep-first per run_fp over an in-plan
    * extraction of `docs`, returning the cleaned frame with its
    * per-doc removed-token count. */
  private[graft] def exactSubstrCut(docs: DataFrame,
      minTokens: Int = DupRunMinTokens): DataFrame = {
    val sites = TextDedup.dupRunSitesOf(docs, minTokens)
    applySpanRemoval(docs, removalSpans(sites))
  }

  // ---------------------------------------------------------------
  // queries
  // ---------------------------------------------------------------

  val queries: Map[String, Q] = Map(

    /** Run-catalog incremental maintenance — seed + two snapshot
      * appends (generations doc_id % 3), then the CONTRACT per
      * generation: credit/retraction row counts, final catalogued
      * sites attributed to each doc's generation, and the
      * maintained-vs-rebuilt multiset mismatch count, which the
      * oracle pins to ZERO. The fixture's cross-generation duplicated
      * spans make the hard path fire for real: a gen-1 doc sharing a
      * span with a gen-0 doc flips the span's shingles from df 1 to 2,
      * retroactively creating runs in the OLD doc — drop the
      * affected-doc recompute or the retraction netting and
      * n_mismatch goes red. */
    "q418_dup_run_store_ivm" -> ((s: SparkSession, dir: String) => {
      val docs = Tables(s, dir, "documents")
      val path = StateStores.statePath(dir, "dup_run_ivm")
      val lc = demoLifecycle(s, docs, path)
      lc.write(0, 2)
      // the final contract READS THE STORE (one tiny runs-sized scan):
      // lc.log()'s cached frames carry the whole derivation lineage,
      // and analyzing that ~20k-line plan costs more driver time than
      // the parquet read costs executors (guide §7.3)
      val deltas = s.read.parquet(s"$path/deltas")
      val perGen = deltas.groupBy(col("gen").cast("long").as("gen"))
        .agg(count_if(col("delta") === 1L).as("n_credit"),
          count_if(col("delta") === -1L).as("n_retract"))
      val maintained = deltas.groupBy(RunKey.map(col): _*)
        .agg(sum(col("delta")).as("im")).filter(col("im") > 0)
      // rebuild = the final-watermark catalog from the lifecycle's ONE
      // shared streak pass (expression-pinned by the oracle; round-16
      // re-derived it with its own window over the cached frames, a
      // second corpus-wide sort)
      val rebuilt = lc.runsAt(2)
        .groupBy(RunKey.map(col): _*).agg(count(lit(1)).as("ir"))
      val genOf = pmod(col("doc_id"), lit(3)).cast("long")
      val cmp = maintained.join(rebuilt, RunKey, "full_outer")
        .groupBy(genOf.as("gen"))
        .agg(count_if(col("ir").isNotNull).as("n_final_sites"),
          count_if(coalesce(col("im"), lit(0L)) =!=
            coalesce(col("ir"), lit(0L))).as("n_mismatch"))
      import s.implicits._
      Seq(0L, 1L, 2L).toDF("gen")
        .join(perGen, Seq("gen"), "left")
        .join(cmp, Seq("gen"), "left")
        .select(col("gen"),
          coalesce(col("n_credit"), lit(0L)).as("n_credit"),
          coalesce(col("n_retract"), lit(0L)).as("n_retract"),
          coalesce(col("n_final_sites"), lit(0L)).as("n_final_sites"),
          coalesce(col("n_mismatch"), lit(0L)).as("n_mismatch"))
        .orderBy(col("gen"))
    }),

    /** Catalog SERVE path — q413's exact output (the grouped run
      * catalog), but the site table is READ from the persisted store,
      * never re-extracted in-plan (the q151/q281 contrast pair applied
      * to this family: q413 stays the in-plan derivation, this is the
      * warm path q414/q415/q420 ride). Same oracle as q413, so a stale
      * or torn catalog goes red against the from-first-principles
      * rebuild. */
    "q419_dup_run_catalog_serve" -> ((s: SparkSession, dir: String) =>
      catalogSites(s, dir)
        .groupBy(col("run_fp"), col("run_tokens"))
        .agg(count(lit(1)).as("n_sites"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(desc("run_tokens"), col("run_fp"))),

    /** The ExactSubstr CUT — the operation q413–q417 catalog, census,
      * plan, and classify (Lee et al. 2022): keep each duplicated
      * run's first site, strip every other occurrence, reconstruct
      * the corpus. Output is the per-doc cleaning manifest: token
      * counts before/removed/after and a fingerprint of the CLEANED
      * text, so the oracle pins the reconstruction byte-for-byte, not
      * just the arithmetic. Reads the persisted catalog (the removal
      * predicates are exactly the stored non-keep sites), rebuilt by
      * the ONE shared interval fold ([[applySpanRemoval]] — the
      * CurationMain stage runs the same code): no covered-mass
      * explode, and O(|toks| + runs) per doc. */
    "q420_exact_substr_cut" -> ((s: SparkSession, dir: String) => {
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), col("text"),
          size(split(col("text"), " ")).cast("long").as("n_before"))
      applySpanRemoval(docs, removalSpans(catalogSites(s, dir)))
        .select(col("doc_id"), col("source"), col("n_before"),
          col("n_removed"),
          (col("n_before") - col("n_removed")).as("n_after"),
          substring(sha2(col("text"), 256), 1, 16).as("cleaned_fp"))
        .orderBy(col("doc_id"))
    }),

    /** Run-store CHECKPOINT/COMPACT contract — the lifecycle step
      * q418 lacks (the q321 pair-store shape applied to positional
      * state): seed + one append (generations doc_id % 3), COMPACT at
      * watermark 1 (delta log folded to one net base generation,
      * postings and doc arrays collapsed, log truncated), then one
      * MORE append onto the compacted state. The gen-2 retraction
      * must debit sites whose credits now live only in the folded
      * base — the cross-boundary case that makes compaction a
      * semantics question instead of a file-count question. Output:
      * folded base site count, delta-log generation count after
      * compact+append (exactly 2 — O(generations) growth is gone),
      * gen-2 retraction rows (data-derived on both sides), final
      * maintained site count, and the maintained-vs-rebuilt multiset
      * mismatch the oracle pins to ZERO. */
    "q421_dup_run_store_compact" -> ((s: SparkSession, dir: String) => {
      val docs = Tables(s, dir, "documents")
      val path = StateStores.statePath(dir, "dup_run_c")
      val lc = demoLifecycle(s, docs, path)
      lc.write(0, 1)
      // fold/collapse inputs from the lifecycle's cached frames (this
      // invocation wrote them moments ago); the swaps still rewrite
      // the store on disk
      runStoreCompactFrom(s, path, watermark = 1,
        Some(lc.log()), Some(lc.posGen), Some(lc.arrGen))
      // temporal by necessity: the folded-base size must be read
      // BETWEEN the compact and the gen-2 append — its own tiny action
      val baseSites = s.read.parquet(s"$path/deltas").count()
      lc.write(2, 2)
      // everything after the last append is ONE plan (the q321 stack
      // shape — round-16: the old two .head actions serialized two
      // driver round-trips over the same delta scan); the rebuild
      // reads the demo's cached corpus frames instead of re-deriving
      // the corpus via dupRunSites (caches release at the caller's
      // clearCache, the q283/q321 lifecycle stance)
      val deltas = s.read.parquet(s"$path/deltas")
      val logM = deltas.agg(
        countDistinct(col("gen")).as("log_gens_after"),
        count_if(col("gen") === 2 && col("delta") === -1L)
          .as("gen2_retracts"))
      val maintained = deltas.groupBy(RunKey.map(col): _*)
        .agg(sum(col("delta")).as("im")).filter(col("im") > 0)
      val rebuilt = lc.runsAt(2)
        .groupBy(RunKey.map(col): _*).agg(count(lit(1)).as("ir"))
      val cmpM = maintained.join(rebuilt, RunKey, "full_outer")
        .agg(count_if(col("ir").isNotNull).as("final_sites"),
          count_if(coalesce(col("im"), lit(0L)) =!=
            coalesce(col("ir"), lit(0L))).as("mismatch"))
      logM.crossJoin(broadcast(cmpM))
        .selectExpr(s"""stack(5,
          'base_sites', ${baseSites}L, 'final_sites', final_sites,
          'gen2_retracts', gen2_retracts, 'log_gens_after', log_gens_after,
          'mismatch', mismatch) AS (metric, v)""")
        .orderBy(col("metric"))
    }),

    /** EVAL-OVERLAP run extraction — the q414 blind spot closed as a
      * first-class screen: maximal ≥ 20-token runs of EVAL-SLICE
      * shingles (doc_id % 50 == 0, the q82 decontamination
      * convention) inside training docs, per source. run_fp equality
      * (q414) sees only identically-extented maximal runs; a
      * benchmark span EMBEDDED in a longer train-side duplicated run
      * is invisible to it but still carries bench shingles position
      * by position — the streak over bench MEMBERSHIP finds its
      * exact extent (DupRunStoreSpec pins the embedded construction).
      * Maximal single-predicate streaks are disjoint per doc, so the
      * token-mass sum is exact without a coverage dedup. This is the
      * measurement twin of the CurationMain span-strip stage — the
      * mass this reports is what stage 4a removes. The bench side is
      * the PERSISTED [[evalShingleStore]] (round-16): the screen is a
      * single-sided probe of the train corpus — the eval slice's
      * posexplode runs once per corpus, not once per screen — and the
      * unchanged from-first-principles oracle (which re-derives the
      * slice's shingles) is the staleness guard. */
    "q422_eval_overlap_runs" -> ((s: SparkSession, dir: String) => {
      val docs = Tables(s, dir, "documents")
      val sites = overlapSitesAgainst(
        docs.filter(col("doc_id") % 50 =!= 0),
        evalShingleStore(s, dir), DupRunMinTokens)
      val src = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"))
      sites.join(src.hint("shuffle_hash"), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_runs"),
          countDistinct(col("doc_id")).as("n_docs_hit"),
          sum(col("run_tokens")).as("overlap_token_mass"),
          max(col("run_tokens")).as("max_run_tokens"))
        .orderBy(col("source"))
    })
  )

  // ---------------------------------------------------------------
  // oracles
  // ---------------------------------------------------------------

  /** Per-snapshot duplicated-run CTE chain for the q418 oracle: the
    * [[TextDedup.duckDupRuns]] derivation replayed at every
    * generation watermark G ∈ {0, 1, 2} (cumulative df over the
    * gen ≤ G slice), plus the affected-doc set per G. */
  private def duckRunIvm: String =
    s"""WITH base AS (
       |  SELECT doc_id, source, CAST(doc_id % 3 AS INT) AS gen,
       |  string_split(text, ' ') AS toks
       |  FROM documents
       |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 3),
       |pos AS (
       |  SELECT doc_id, gen, i,
       |  concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS sh
       |  FROM base, unnest(generate_series(1, len(toks) - 2)) AS t(i)),
       |gg AS (SELECT unnest([0, 1, 2]) AS G),
       |dfle AS (
       |  SELECT p.sh, g.G AS G,
       |  count(*) FILTER (p.gen <= g.G) AS dfA,
       |  count(*) FILTER (p.gen < g.G) AS dfB
       |  FROM pos p CROSS JOIN gg g GROUP BY 1, 2),
       |dup AS (
       |  SELECT p.doc_id, p.gen, p.i, d.G
       |  FROM pos p JOIN dfle d ON d.sh = p.sh
       |  WHERE p.gen <= d.G AND d.dfA >= 2),
       |grp AS (
       |  SELECT doc_id, gen, G, i,
       |  i - row_number() OVER (PARTITION BY doc_id, G ORDER BY i) AS rk
       |  FROM dup),
       |runs AS (
       |  SELECT doc_id, gen, G, min(i) AS start_tok,
       |  count(*) + 2 AS run_tokens
       |  FROM grp GROUP BY doc_id, gen, G, rk
       |  HAVING count(*) + 2 >= ${TextDedup.DupRunMinTokens}),
       |crossdocs AS (
       |  SELECT DISTINCT p.doc_id, d.G
       |  FROM pos p JOIN dfle d ON d.sh = p.sh
       |  WHERE p.gen < d.G AND d.dfB < 2 AND d.dfA >= 2),
       |affected AS (
       |  SELECT doc_id, gen AS G FROM base
       |  UNION SELECT doc_id, G FROM crossdocs)""".stripMargin

  val oracles: Map[String, String] = Map(

    // the whole maintenance history from first principles: per-G
    // snapshot runs (cumulative df over the gen <= G slice), affected
    // docs (new gen + retroactive crossers), credits = snapshot-G
    // runs of affected docs, retractions = snapshot-(G-1) runs of
    // affected docs, final sites at G = 2 by doc generation — and
    // mismatch pinned to zero (the Spark side computes it against its
    // own netted delta log)
    "q418_dup_run_store_ivm" ->
      s"""$duckRunIvm,
         |pc AS (
         |  SELECT r.G AS gen, CAST(count(*) AS BIGINT) AS n_credit
         |  FROM runs r JOIN affected a
         |  ON a.doc_id = r.doc_id AND a.G = r.G
         |  GROUP BY 1),
         |rc AS (
         |  SELECT a.G AS gen, CAST(count(*) AS BIGINT) AS n_retract
         |  FROM runs r JOIN affected a
         |  ON a.doc_id = r.doc_id AND a.G = r.G + 1
         |  GROUP BY 1),
         |fin AS (
         |  SELECT CAST(doc_id % 3 AS BIGINT) AS gen,
         |  CAST(count(*) AS BIGINT) AS n_final_sites
         |  FROM runs WHERE G = 2 GROUP BY 1)
         |SELECT CAST(g.G AS BIGINT) AS gen,
         |coalesce(pc.n_credit, 0) AS n_credit,
         |coalesce(rc.n_retract, 0) AS n_retract,
         |coalesce(fin.n_final_sites, 0) AS n_final_sites,
         |CAST(0 AS BIGINT) AS n_mismatch
         |FROM gg g
         |LEFT JOIN pc ON pc.gen = g.G
         |LEFT JOIN rc ON rc.gen = g.G
         |LEFT JOIN fin ON fin.gen = g.G
         |ORDER BY gen NULLS FIRST""".stripMargin,

    // the q413 catalog from first principles — the serve path must
    // reproduce the in-plan extraction exactly (staleness guard)
    "q419_dup_run_catalog_serve" ->
      s"""${TextDedup.duckDupRuns}
         |SELECT run_fp, CAST(run_tokens AS BIGINT) AS run_tokens,
         |CAST(count(*) AS BIGINT) AS n_sites,
         |CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |CAST(min(doc_id) AS BIGINT) AS first_doc
         |FROM wt GROUP BY 1, 2
         |ORDER BY run_tokens DESC, run_fp NULLS FIRST""".stripMargin,

    // keep-first per run_fp, strip the rest, rebuild the text: the
    // cleaned fingerprint pins the reconstruction byte-for-byte.
    // Totals over every non-null doc on the raw split (q415's stance)
    "q420_exact_substr_cut" ->
      s"""${TextDedup.duckDupRuns},
         |marked AS (
         |  SELECT doc_id, start_tok, run_tokens,
         |  row_number() OVER (PARTITION BY run_fp
         |    ORDER BY doc_id, start_tok) AS rk
         |  FROM wt),
         |rem AS (
         |  SELECT DISTINCT m.doc_id, t.p
         |  FROM marked m, unnest(generate_series(m.start_tok,
         |    m.start_tok + m.run_tokens - 1)) AS t(p)
         |  WHERE m.rk > 1),
         |alld AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |tok AS (
         |  SELECT doc_id, i, toks[i] AS tok
         |  FROM alld, unnest(generate_series(1, len(toks))) AS t(i)),
         |surv AS (
         |  SELECT t.doc_id, t.i, t.tok
         |  FROM tok t LEFT JOIN rem r
         |  ON r.doc_id = t.doc_id AND r.p = t.i
         |  WHERE r.doc_id IS NULL),
         |cleaned AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ctext
         |  FROM surv GROUP BY doc_id),
         |rcount AS (SELECT doc_id, count(*) AS nr FROM rem GROUP BY 1)
         |SELECT a.doc_id, a.source,
         |CAST(len(a.toks) AS BIGINT) AS n_before,
         |CAST(coalesce(rc.nr, 0) AS BIGINT) AS n_removed,
         |CAST(len(a.toks) - coalesce(rc.nr, 0) AS BIGINT) AS n_after,
         |substr(sha256(coalesce(c.ctext, '')), 1, 16) AS cleaned_fp
         |FROM alld a
         |LEFT JOIN rcount rc ON rc.doc_id = a.doc_id
         |LEFT JOIN cleaned c ON c.doc_id = a.doc_id
         |ORDER BY a.doc_id NULLS FIRST""".stripMargin,

    // bench-membership streaks from first principles: string shingles,
    // eval slice = doc_id % 50 = 0, streaks over train positions whose
    // shingle occurs anywhere in the slice
    "q422_eval_overlap_runs" ->
      s"""WITH train AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |  WHERE text IS NOT NULL AND doc_id % 50 <> 0
         |  AND len(string_split(text, ' ')) >= 3),
         |bench AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |  WHERE text IS NOT NULL AND doc_id % 50 = 0
         |  AND len(string_split(text, ' ')) >= 3),
         |bsh AS (
         |  SELECT DISTINCT concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS sh
         |  FROM bench, unnest(generate_series(1, len(toks) - 2)) AS t(i)),
         |tpos AS (
         |  SELECT doc_id, i,
         |  concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS sh
         |  FROM train, unnest(generate_series(1, len(toks) - 2)) AS t(i)),
         |hit AS (SELECT p.doc_id, p.i FROM tpos p JOIN bsh b ON b.sh = p.sh),
         |grp AS (
         |  SELECT doc_id, i,
         |  i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rk
         |  FROM hit),
         |runs AS (
         |  SELECT doc_id, count(*) + 2 AS run_tokens
         |  FROM grp GROUP BY doc_id, rk
         |  HAVING count(*) + 2 >= ${TextDedup.DupRunMinTokens}),
         |src AS (
         |  SELECT doc_id, source FROM documents WHERE text IS NOT NULL)
         |SELECT s.source, CAST(count(*) AS BIGINT) AS n_runs,
         |CAST(count(DISTINCT r.doc_id) AS BIGINT) AS n_docs_hit,
         |CAST(sum(r.run_tokens) AS BIGINT) AS overlap_token_mass,
         |CAST(max(r.run_tokens) AS BIGINT) AS max_run_tokens
         |FROM runs r JOIN src s ON s.doc_id = r.doc_id
         |GROUP BY 1 ORDER BY s.source NULLS FIRST""".stripMargin,

    // compaction contract from first principles: the folded base must
    // equal the snapshot-1 catalog (maintained ≡ rebuilt per doc, by
    // the q418 induction), the post-compaction log holds exactly 2
    // generations (structural — the Spark side computes it), gen-2
    // retractions = snapshot-1 sites of docs affected at G = 2, the
    // final catalog = the snapshot-2 extraction, mismatch pinned 0
    "q421_dup_run_store_compact" ->
      s"""$duckRunIvm
         |SELECT metric, v FROM (
         |  SELECT 'base_sites' AS metric, CAST(
         |    (SELECT count(*) FROM runs WHERE G = 1) AS BIGINT) AS v
         |  UNION ALL SELECT 'log_gens_after', CAST(2 AS BIGINT)
         |  UNION ALL SELECT 'gen2_retracts', CAST(coalesce(
         |    (SELECT count(*) FROM runs r JOIN affected a
         |     ON a.doc_id = r.doc_id AND a.G = 2 AND r.G = 1), 0) AS BIGINT)
         |  UNION ALL SELECT 'final_sites', CAST(
         |    (SELECT count(*) FROM runs WHERE G = 2) AS BIGINT)
         |  UNION ALL SELECT 'mismatch', CAST(0 AS BIGINT))
         |ORDER BY metric NULLS FIRST""".stripMargin
  )
}
