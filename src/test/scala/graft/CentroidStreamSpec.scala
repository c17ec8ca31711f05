package graft

import org.apache.spark.sql.functions._
import graft.llm.{Similarity, StateStores}

/** Live centroid maintenance contract — the last maintained store gets
  * its streaming twin (q230 is the batch form):
  *
  *  1. a snapshot streamed as two micro-batches folds the persisted
  *     centroid state to EXACTLY what two sequential batch
  *     [[StateStores.centroidUpdateRaw]] applications produce (the
  *     running mean is order-dependent but deterministic given the
  *     pinned batch order);
  *  2. the versioned-snapshot pattern survives the commit-window
  *     crash: deleting the newest commit marker and restarting
  *     recomputes the replayed version from its intact predecessor —
  *     identical state, no double-fold (the failure mode a naive
  *     fold-in-place sink has under at-least-once replay).
  */
class CentroidStreamSpec extends SparkSuite {

  import java.nio.file.{Files, Paths}

  private def seedState(statePath: String): Unit = {
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val (cents, assigned) = Similarity.trainKmeans(corpus, k = 8, iters = 2,
      initPred = Some(col("vec_id").between(1, 8)))
    val sizes = assigned.groupBy(col("cent_id")).agg(count(lit(1)).as("n"))
    import spark.implicits._
    cents.flatMap { case (cid, c) =>
        c.iterator.zipWithIndex.map { case (v, i) => (cid, i.toLong, v) } }
      .toDF("cent_id", "pos", "coord")
      .join(broadcast(sizes), Seq("cent_id"))
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
    * path, returning the expected final (cent_id, pos, coord, n). */
  private def expectedState(statePath: String, srcDir: String)
      : Array[(Long, Long, Double, Long)] = {
    var st = spark.read.parquet(s"$statePath/v=-1")
    (0 until 2).foreach { g =>
      val batch = spark.read.parquet(s"$srcDir/part$g")
      st = StateStores.centroidUpdateRaw(spark, st, batch)
        .select(col("cent_id"), col("pos"), col("coord_raw").as("coord"),
          (col("n_before") + col("n_added")).as("n"))
    }
    st.collect().map(r => (r.getAs[Long]("cent_id"), r.getAs[Long]("pos"),
      r.getAs[Double]("coord"), r.getAs[Long]("n"))).sortBy(t => (t._1, t._2))
  }

  private def finalState(statePath: String): Array[(Long, Long, Double, Long)] = {
    // the GC-race-hardened serve read — specs exercise the exact
    // helper a cross-process reader uses
    StateStores.readLatestVersion(spark, statePath)(_.collect())
      .map(r => (r.getAs[Long]("cent_id"), r.getAs[Long]("pos"),
        r.getAs[Double]("coord"), r.getAs[Long]("n")))
      .sortBy(t => (t._1, t._2))
  }

  test("streamed centroid folds equal the sequential batch folds, bit-for-bit") {
    val srcDir = Files.createTempDirectory("graft_cent_src").toString
    val statePath = Files.createTempDirectory("graft_cent_state")
      .resolve("state").toString
    seedState(statePath)
    stageSnap(srcDir)
    val want = expectedState(statePath, srcDir)
    val q = streaming.EventStreams.centroidUpdateSink(src(srcDir), statePath)
    q.processAllAvailable(); q.stop()
    val got = finalState(statePath)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"streamed state cell $g != sequential batch fold $w")
    }
  }

  test("commit-window kill/restart recomputes the version without double-folding") {
    val srcDir = Files.createTempDirectory("graft_cent_crash_src").toString
    val statePath = Files.createTempDirectory("graft_cent_crash_state")
      .resolve("state").toString
    val ckpt = Files.createTempDirectory("graft_cent_ckpt").toString
    seedState(statePath)
    stageSnap(srcDir)
    val want = expectedState(statePath, srcDir)
    def start() = streaming.EventStreams.centroidUpdateSink(
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
      assert(g == w, s"replayed state cell $g != sequential batch fold $w " +
        "— the versioned-snapshot idempotence is broken")
    }
  }

  test("version GC bounds the snapshot log and survives the replay window") {
    val srcDir = Files.createTempDirectory("graft_cent_gc_src").toString
    val statePath = Files.createTempDirectory("graft_cent_gc_state")
      .resolve("state").toString
    val ckpt = Files.createTempDirectory("graft_cent_gc_ckpt").toString
    seedState(statePath)
    stageSnap(srcDir)
    val want = expectedState(statePath, srcDir)
    def versionDirs() = {
      val st = Files.list(Paths.get(statePath))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("v=")).toVector.sorted
      } finally st.close()
    }
    // retention 2 (the minimum): after both batches only the newest
    // two committed versions may remain — the seed and batch 0 must
    // be GONE, and the served state is still the exact batch fold
    def start() = streaming.EventStreams.centroidUpdateSink(
      src(srcDir), statePath, checkpoint = Some(ckpt), retainVersions = 2)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(versionDirs() == Vector("v=0", "v=1"),
      s"GC left ${versionDirs()} — retention 2 must keep exactly the newest 2")
    val got = finalState(statePath)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"GC'd state cell $g != sequential batch fold $w")
    }
    // replay across the GC'd log: drop batch 1's commit and restart —
    // the fold reads latestVersionBelow(1) = v=0, which retention 2
    // preserved by construction
    Files.delete(Paths.get(s"$ckpt/commits/1"))
    Files.deleteIfExists(Paths.get(s"$ckpt/commits/.1.crc"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(versionDirs() == Vector("v=0", "v=1"))
    finalState(statePath).zip(want).foreach { case (g, w) =>
      assert(g == w, s"post-GC replayed cell $g != batch fold $w")
    }
  }
}
