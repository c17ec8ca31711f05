package graft

import org.apache.spark.sql.functions._
import graft.llm.{PairGraph, TextDedup}

/** LIVE pair-graph IVM contract (round-11 verdict Missing #1 / Next #1):
  * the delta log with cap-crossing RETRACTIONS — the one persisted
  * store that was maintained only in batch — driven from a real
  * checkpointed stream, three ways:
  *
  *   1. maintained ≡ rebuilt as a multiset after ≥ 2 micro-batches,
  *      WITH the stream actually firing retractions (a cumulative df
  *      crosses the cap at a micro-batch boundary — drop the
  *      retraction logic and the multiset check goes red);
  *   2. the same equality across a kill/restart in the exact window
  *      between the sink write and the streaming commit (the
  *      StreamingRecoverySpec crash shape applied to THIS store);
  *   3. the serve side: the q361 dedup-threshold curve read from the
  *      stream-maintained store equals the batch query's output
  *      row-for-row (the round-11 Next #8 live twin).
  *
  * The batch q283 oracle is untouched — the stream rides the same
  * [[PairGraph.ivmDeltas]] derivation, so batch and live maintenance
  * cannot drift apart without one of them going red.
  */
class PairIvmStreamSpec extends SparkSuite {

  import java.nio.file.{Files, Paths}

  /** Stage the corpus as three generation files with EXPLICIT spaced
    * mtimes (the StreamingLatenessSpec stance — a 1-second-granularity
    * filesystem must not coalesce or reorder the micro-batches). */
  private def stage(srcDir: String): Unit = {
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    (0 until 3).foreach { g =>
      docs.filter(pmod(col("doc_id"), lit(3)) === g)
        .coalesce(1).write.parquet(s"$srcDir/gen$g")
      val ft = java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + g * 10000L)
      val walk = Files.walk(Paths.get(s"$srcDir/gen$g"))
      try walk.forEach(p => Files.setLastModifiedTime(p, ft))
      finally walk.close()
    }
  }

  private def src(srcDir: String) = spark.readStream
    .schema("doc_id BIGINT, text STRING")
    .option("maxFilesPerTrigger", "1")
    .parquet(s"$srcDir/gen*")

  /** (multiset mismatches vs the from-scratch rebuild at `cap`,
    * total retraction rows in the maintained log). */
  private def contract(statePath: String, cap: Int): (Long, Long) = {
    val docs = Tables(spark, sf, "documents")
    val deltas = spark.read.parquet(s"$statePath/deltas")
    val maintained = deltas
      .groupBy(col("d1"), col("d2")).agg(sum(col("delta")).as("im"))
      .filter(col("im") > 0)
    val shAll = TextDedup.explodeShingles(TextDedup.shingleArrays(docs))
    val cappedF = shAll.join(
      shAll.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select(col("sh")).hint("shuffle_hash"),
      Seq("sh"), "left_semi").cache()
    val rebuilt = cappedF.as("a")
      .join(cappedF.as("b").hint("shuffle_hash"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("ir"))
    val bad = maintained.join(rebuilt, Seq("d1", "d2"), "full_outer")
      .filter(coalesce(col("im"), lit(0L)) =!= coalesce(col("ir"), lit(0L)))
      .count()
    cappedF.unpersist()
    (bad, deltas.filter(col("delta") === -1L).count())
  }

  test("stream-maintained pair graph equals the batch rebuild, retractions included") {
    val srcDir = Files.createTempDirectory("graft_pivm_src").toString
    val statePath = Files.createTempDirectory("graft_pivm_state")
      .resolve("state").toString
    stage(srcDir)
    val q = streaming.EventStreams.pairGraphIvmSink(
      src(srcDir), statePath, PairGraph.IvmCap)
    q.processAllAvailable(); q.stop()
    val (bad, retracts) = contract(statePath, PairGraph.IvmCap)
    assert(bad == 0L,
      s"stream-maintained pair graph diverged from the batch rebuild on $bad pairs")
    // the hard part actually exercised: a shingle's cumulative df
    // crossed the cap at a micro-batch boundary and debited its
    // previously-credited pairs FROM THE STREAM
    assert(retracts > 0L,
      "no retraction rows — the cap never crossed between micro-batches, " +
        "so this spec is not testing the hard path (re-slice the feed)")
  }

  test("commit-window kill/restart replays the maintenance batch idempotently") {
    val srcDir = Files.createTempDirectory("graft_pivm_crash_src").toString
    val statePath = Files.createTempDirectory("graft_pivm_crash_state")
      .resolve("state").toString
    val ckpt = Files.createTempDirectory("graft_pivm_ckpt").toString
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    def gen(g: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === g)
    (0 until 2).foreach { g =>
      gen(g).coalesce(1).write.parquet(s"$srcDir/gen$g")
      val ft = java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + g * 10000L)
      val walk = Files.walk(Paths.get(s"$srcDir/gen$g"))
      try walk.forEach(p => Files.setLastModifiedTime(p, ft))
      finally walk.close()
    }
    def start() = streaming.EventStreams.pairGraphIvmSink(
      src(srcDir), statePath, PairGraph.IvmCap, checkpoint = Some(ckpt))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(Files.exists(Paths.get(s"$ckpt/commits/1")),
      "phase 1 must commit two micro-batches")
    // the crash window: batch 1's postings+deltas are on disk, its
    // streaming commit never landed
    Files.delete(Paths.get(s"$ckpt/commits/1"))
    Files.deleteIfExists(Paths.get(s"$ckpt/commits/.1.crc"))
    // more input arrives while "down"
    gen(2).coalesce(1).write.parquet(s"$srcDir/gen2")
    val ft = java.nio.file.attribute.FileTime.fromMillis(1700000020000L)
    val walk = Files.walk(Paths.get(s"$srcDir/gen2"))
    try walk.forEach(p => Files.setLastModifiedTime(p, ft))
    finally walk.close()
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val (bad, _) = contract(statePath, PairGraph.IvmCap)
    assert(bad == 0L,
      s"replayed maintenance diverged from the batch rebuild on $bad pairs — " +
        "the gen=<id> overwrite idempotence is broken")
    // the replay actually happened: generations are exactly 0..2
    val gens = spark.read.parquet(s"$statePath/deltas")
      .select(col("gen").cast("long")).distinct().collect()
      .map(_.getLong(0)).sorted
    assert(gens.sameElements(Array(0L, 1L, 2L)),
      s"expected generations 0..2 after recovery, saw ${gens.mkString(",")}")
  }

  test("mid-stream compaction composes with live maintenance") {
    // the q321 lifecycle driven from a STREAM: two micro-batches land,
    // the store is compacted at the log head while the stream is down
    // (the maintenance-window shape), then a third batch arrives on the
    // compacted state — its cap-crossing retractions must debit pairs
    // whose credits now live only in the folded base generation, and
    // maintained must still equal the from-scratch rebuild.
    val srcDir = Files.createTempDirectory("graft_pivm_cmp_src").toString
    val statePath = Files.createTempDirectory("graft_pivm_cmp_state")
      .resolve("state").toString
    val ckpt = Files.createTempDirectory("graft_pivm_cmp_ckpt").toString
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    def gen(g: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === g)
    def putGen(g: Int): Unit = {
      gen(g).coalesce(1).write.parquet(s"$srcDir/gen$g")
      val ft = java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + g * 10000L)
      val walk = Files.walk(Paths.get(s"$srcDir/gen$g"))
      try walk.forEach(p => Files.setLastModifiedTime(p, ft))
      finally walk.close()
    }
    (0 until 2).foreach(putGen)
    def start() = streaming.EventStreams.pairGraphIvmSink(
      src(srcDir), statePath, PairGraph.IvmCap, checkpoint = Some(ckpt))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    PairGraph.compact(spark, statePath, watermark = 1)
    val gensAfterCompact = spark.read.parquet(s"$statePath/deltas")
      .select(col("gen").cast("long")).distinct().count()
    assert(gensAfterCompact == 1L, "compaction must fold the log to one base")
    putGen(2)
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val (bad, retracts) = contract(statePath, PairGraph.IvmCap)
    assert(bad == 0L,
      s"post-compaction live maintenance diverged on $bad pairs — the " +
        "stream is not reading the folded base correctly")
    assert(retracts > 0L,
      "the post-compaction batch fired no retractions — the " +
        "cross-boundary debit path went untested")
  }

  test("the sink auto-compacts the pair log mid-stream, maintenance stays exact") {
    // round-12 verdict Missing #3, pair-graph flavor: the mid-stream
    // compaction test above required an operator to call compact in a
    // maintenance window; here the SINK triggers it at the committed
    // head (autoCompactEvery = 3, five generations ⇒ the fold fires at
    // batch 3's start, folding {0,1,2}→gen=2), and the maintained
    // graph — including retractions that debit pairs whose credits now
    // live only in the folded base — still equals the from-scratch
    // rebuild.
    val srcDir = Files.createTempDirectory("graft_pivm_auto_src").toString
    val statePath = Files.createTempDirectory("graft_pivm_auto_state")
      .resolve("state").toString
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    (0 until 5).foreach { g =>
      docs.filter(pmod(col("doc_id"), lit(5)) === g)
        .coalesce(1).write.parquet(s"$srcDir/gen$g")
      val ft = java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + g * 10000L)
      val walk = Files.walk(Paths.get(s"$srcDir/gen$g"))
      try walk.forEach(p => Files.setLastModifiedTime(p, ft))
      finally walk.close()
    }
    val q = streaming.EventStreams.pairGraphIvmSink(
      src(srcDir), statePath, PairGraph.IvmCap, autoCompactEvery = 3)
    q.processAllAvailable(); q.stop()
    val gens = spark.read.parquet(s"$statePath/deltas")
      .select(col("gen").cast("long")).distinct().collect()
      .map(_.getLong(0)).sorted
    assert(gens.sameElements(Array(2L, 3L, 4L)),
      s"auto-compaction at batch 3 must fold {0,1,2}→gen=2; saw " +
        gens.mkString(","))
    val (bad, retracts) = contract(statePath, PairGraph.IvmCap)
    assert(bad == 0L,
      s"auto-compacted live maintenance diverged on $bad pairs")
    assert(retracts > 0L,
      "no retraction rows survived/fired around the auto-compaction — " +
        "the hard path went untested (re-slice the feed)")
  }

  test("live threshold-curve serve equals the batch q361 output") {
    val srcDir = Files.createTempDirectory("graft_pivm361_src").toString
    val statePath = Files.createTempDirectory("graft_pivm361_state")
      .resolve("state").toString
    stage(srcDir)
    // the PRODUCTION cap: the live store must reproduce the q361 curve,
    // whose domain is the DfCap universe
    val q = streaming.EventStreams.pairGraphIvmSink(
      src(srcDir), statePath, TextDedup.DfCap)
    q.processAllAvailable(); q.stop()
    val docs = Tables(spark, sf, "documents")
    val live = PairGraph.thresholdCurveFromIvm(
      spark, statePath, TextDedup.DfCap, docs).collect()
    val batch = SparkEntry.queries("q361_dedup_threshold_curve")(spark, sf)
      .collect()
    assert(live.length == batch.length,
      s"live curve has ${live.length} rows vs batch ${batch.length}")
    live.zip(batch).foreach { case (l, b) =>
      assert(l == b, s"live curve row $l != batch row $b")
    }
  }
}
