package graft

import org.apache.spark.sql.functions._
import graft.llm.{DupRunStore, TextDedup}

/** LIVE duplicated-run catalog maintenance (the round-14 verdict's
  * last store-parity gap closed end-to-end): the q418 batch IVM driven
  * from a real checkpointed stream via
  * [[streaming.EventStreams.dupRunIvmSink]], three ways:
  *
  *   1. maintained ≡ rebuilt as a multiset after 2 micro-batches,
  *      WITH the retroactive path actually firing across the batch
  *      boundary (batch 1 extends a run batch 0 already catalogued —
  *      drop the retraction netting and the multiset check goes red);
  *   2. the same equality across a kill/restart in the exact window
  *      between the sink write and the streaming commit;
  *   3. the serve read: the netted catalog equals the in-plan
  *      [[TextDedup.dupRunSitesOf]] extraction row-for-row.
  *
  * Round 16 adds the eval-shingle log's live twin
  * ([[streaming.EventStreams.evalShingleSink]]): streamed ≡ rebuilt
  * slice set (empty-slice generations included), mid-stream
  * compaction folding, and commit-window replay idempotence.
  */
class DupRunStreamSpec extends SparkSuite {

  import java.nio.file.{Files, Paths}

  private def phrase = (1 to 25).map(j => s"P$j")

  private def doc0 = ((1 to 10).map(j => s"u$j") ++ phrase ++
    (1 to 12).map(j => s"v$j") ++ phrase ++ (1 to 10).map(j => s"w$j"))
    .mkString(" ")

  private def doc1 = ((1 to 5).map(j => s"z$j") ++
    (3 to 10).map(j => s"u$j") ++ phrase.take(12) ++
    (6 to 15).map(j => s"z$j")).mkString(" ")

  private def stage(srcDir: String, gens: Seq[Seq[(Long, String)]]): Unit = {
    import spark.implicits._
    gens.zipWithIndex.foreach { case (rows, g) =>
      rows.toDF("doc_id", "text").withColumn("source", lit("web"))
        .coalesce(1).write.parquet(s"$srcDir/gen$g")
      val ft = java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + g * 10000L)
      val walk = Files.walk(Paths.get(s"$srcDir/gen$g"))
      try walk.forEach(p => Files.setLastModifiedTime(p, ft))
      finally walk.close()
    }
  }

  private def src(srcDir: String) = spark.readStream
    .schema("doc_id BIGINT, text STRING, source STRING")
    .option("maxFilesPerTrigger", "1")
    .parquet(s"$srcDir/gen*")

  /** (multiset mismatches vs the in-plan rebuild, retraction rows). */
  private def contract(statePath: String, all: Seq[(Long, String)])
      : (Long, Long) = {
    import spark.implicits._
    val deltas = spark.read.parquet(s"$statePath/deltas")
    val key = Seq("doc_id", "source", "start_tok", "run_tokens", "run_fp")
    val maintained = deltas.groupBy(key.map(col): _*)
      .agg(sum(col("delta")).as("im")).filter(col("im") > 0)
    val rebuilt = TextDedup.dupRunSitesOf(
        all.toDF("doc_id", "text").withColumn("source", lit("web")),
        TextDedup.DupRunMinTokens)
      .groupBy(key.map(col): _*).agg(count(lit(1)).as("ir"))
    val bad = maintained.join(rebuilt, key, "full_outer")
      .filter(coalesce(col("im"), lit(0L)) =!= coalesce(col("ir"), lit(0L)))
      .count()
    (bad, deltas.filter(col("delta") === -1L).count())
  }

  test("stream-maintained run catalog equals the rebuild, retro extension included") {
    val srcDir = Files.createTempDirectory("graft_drs_src").toString
    val statePath = Files.createTempDirectory("graft_drs_state")
      .resolve("state").toString
    stage(srcDir, Seq(Seq(0L -> doc0), Seq(1L -> doc1)))
    val q = streaming.EventStreams.dupRunIvmSink(src(srcDir), statePath)
    q.processAllAvailable(); q.stop()
    val (bad, retracts) = contract(statePath, Seq(0L -> doc0, 1L -> doc1))
    assert(bad == 0L,
      s"stream-maintained catalog diverged from the rebuild on $bad sites")
    // the hard path actually exercised: batch 1 extended doc 0's
    // gen-0 run, so its old sites were debited FROM THE STREAM
    assert(retracts >= 2L,
      "no retraction rows — the retro extension never fired across " +
        "the micro-batch boundary (re-slice the feed)")
  }

  test("live compaction cadence folds the log mid-stream without changing the catalog") {
    // autoCompactEvery = 2 over three micro-batches: batch 2 opens by
    // folding the committed gens {0, 1} into one base, then lands its
    // own generation — doc 2 extends doc 0's SECOND run, so its
    // retraction debits the freshly folded base (the q421 boundary
    // case, live). The final catalog must still equal the rebuild.
    val doc2 = ((1 to 5).map(j => s"x$j") ++ (9 to 12).map(j => s"v$j") ++
      phrase.take(16) ++ (6 to 15).map(j => s"x$j")).mkString(" ")
    val srcDir = Files.createTempDirectory("graft_drs_cmp_src").toString
    val statePath = Files.createTempDirectory("graft_drs_cmp_state")
      .resolve("state").toString
    stage(srcDir, Seq(Seq(0L -> doc0), Seq(1L -> doc1), Seq(2L -> doc2)))
    val q = streaming.EventStreams.dupRunIvmSink(src(srcDir), statePath,
      autoCompactEvery = 2)
    q.processAllAvailable(); q.stop()
    val (bad, retracts) = contract(statePath,
      Seq(0L -> doc0, 1L -> doc1, 2L -> doc2))
    assert(bad == 0L,
      s"live-compacted catalog diverged from the rebuild on $bad sites")
    assert(retracts >= 2L,
      "the post-compaction batch must debit the folded base")
    val gens = {
      val st = Files.list(Paths.get(s"$statePath/deltas"))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("gen=")).toSet
      } finally st.close()
    }
    assert(gens == Set("gen=1", "gen=2"),
      s"the live fold must truncate the log: $gens")
  }

  test("live eval-shingle log: streamed serve equals the rebuilt slice set, compaction included") {
    // Round-16: the eval-shingle store's live twin. Three micro-batches
    // — batch 0 carries eval doc 0 + a train doc, batch 1 carries eval
    // doc 50 + a train doc, batch 2 carries ONLY train text (an
    // empty-slice generation, the part-less-dir read path) — under
    // autoCompactEvery = 2, so batch 2 opens by folding gens {0, 1}
    // to one distinct base. The serve must equal the whole corpus's
    // eval-slice shingle set, train text contributing nothing.
    import spark.implicits._
    val eval0 = (1 to 30).map(j => s"ev$j").mkString(" ")
    val eval50 = ((11 to 30).map(j => s"ev$j") ++ (1 to 10).map(j => s"ew$j"))
      .mkString(" ") // overlaps eval0 — the cross-generation distinct case
    val train = (1 to 30).map(j => s"tr$j").mkString(" ")
    val srcDir = Files.createTempDirectory("graft_evs_src").toString
    val statePath = Files.createTempDirectory("graft_evs_state")
      .resolve("state").toString
    stage(srcDir, Seq(
      Seq(0L -> eval0, 1L -> train),
      Seq(50L -> eval50, 2L -> train),
      Seq(3L -> train)))
    val q = streaming.EventStreams.evalShingleSink(src(srcDir), statePath,
      autoCompactEvery = 2)
    q.processAllAvailable(); q.stop()
    val served = DupRunStore.evalShinglesServe(spark, statePath)
    val expected = Seq(0L -> eval0, 50L -> eval50).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 2),
          |  i -> xxhash64(concat_ws(' ', slice(toks, i, 3))))"""
          .stripMargin)).as("sh"))
      .distinct()
    assert(served.count() == expected.count(),
      "streamed eval-shingle set must match the rebuilt slice set")
    assert(served.join(expected, Seq("sh"), "full_outer")
      .filter(col("sh").isNull).count() == 0L)
    // the fold really happened: gens {0,1} collapsed to base gen=1
    val gens = {
      val st = Files.list(Paths.get(statePath))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("gen=")).toSet
      } finally st.close()
    }
    assert(gens == Set("gen=1", "gen=2"), s"log not folded: $gens")
  }

  test("live eval-shingle log replays its batch idempotently across a commit-window kill") {
    import spark.implicits._
    val eval0 = (1 to 30).map(j => s"rx$j").mkString(" ")
    val eval50 = (1 to 30).map(j => s"ry$j").mkString(" ")
    val srcDir = Files.createTempDirectory("graft_evs_crash_src").toString
    val statePath = Files.createTempDirectory("graft_evs_crash_state")
      .resolve("state").toString
    val ckpt = Files.createTempDirectory("graft_evs_ckpt").toString
    stage(srcDir, Seq(Seq(0L -> eval0), Seq(50L -> eval50)))
    def start() = streaming.EventStreams.evalShingleSink(
      src(srcDir), statePath, checkpoint = Some(ckpt))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(Files.exists(Paths.get(s"$ckpt/commits/1")))
    // the crash window: batch 1's gen dir is on disk, its commit is not
    Files.delete(Paths.get(s"$ckpt/commits/1"))
    Files.deleteIfExists(Paths.get(s"$ckpt/commits/.1.crc"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    // 28 distinct shingles per 30-token doc, disjoint across the two
    val served = DupRunStore.evalShinglesServe(spark, statePath).count()
    assert(served == 56L,
      s"replayed eval-shingle log must converge to the same set: $served")
  }

  test("commit-window kill/restart replays the maintenance batch idempotently") {
    val srcDir = Files.createTempDirectory("graft_drs_crash_src").toString
    val statePath = Files.createTempDirectory("graft_drs_crash_state")
      .resolve("state").toString
    val ckpt = Files.createTempDirectory("graft_drs_ckpt").toString
    stage(srcDir, Seq(Seq(0L -> doc0), Seq(1L -> doc1)))
    def start() = streaming.EventStreams.dupRunIvmSink(
      src(srcDir), statePath, checkpoint = Some(ckpt))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(Files.exists(Paths.get(s"$ckpt/commits/1")),
      "phase 1 must commit two micro-batches")
    // the crash window: batch 1's state is on disk, its commit is not
    Files.delete(Paths.get(s"$ckpt/commits/1"))
    Files.deleteIfExists(Paths.get(s"$ckpt/commits/.1.crc"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val (bad, retracts) = contract(statePath, Seq(0L -> doc0, 1L -> doc1))
    assert(bad == 0L,
      s"replayed maintenance diverged from the rebuild on $bad sites — " +
        "the gen=<batchId> overwrite must make replays idempotent")
    assert(retracts >= 2L, "the replayed batch must still carry its retractions")
  }
}
