package graft

import org.apache.spark.sql.functions._
import graft.llm._

/** Specs for the LLM-pipeline operators (dedup / similarity / text /
  * multimodal). Correctness vs DuckDB is covered by the Verify gate;
  * these pin the algorithmic invariants that the oracle can't express. */
class LlmOpsSpec extends SparkSuite {

  test("minhash LSH output equals exact jaccard at the verify threshold") {
    val exact = TextDedup.queries("q34_dedup_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.8)
      .select("d1", "d2", "jaccard").collect().map(_.toSeq).toSet
    val lsh = TextDedup.queries("q35_dedup_minhash")(spark, sf)
      .select("d1", "d2", "jaccard").collect().map(_.toSeq).toSet
    assert(lsh == exact, s"minhash candidates missed pairs: ${exact.diff(lsh)}")
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("exact dedup and sha dedup agree on canonical groups") {
    val byText = TextDedup.queries("q32_dedup_exact")(spark, sf)
      .select("canonical_id", "n_copies").collect().map(_.toSeq).toSet
    val bySha = TextDedup.queries("q33_dedup_sha")(spark, sf)
      .select("canonical_id", "n_copies").collect().map(_.toSeq).toSet
    assert(byText == bySha)
  }

  test("simhash pairs have verified hamming distance and high unigram jaccard") {
    val sim = TextDedup.queries("q36_dedup_simhash")(spark, sf).collect()
    assert(sim.nonEmpty)
    assert(sim.forall(_.getAs[Long]("hamming") <= 3))
    // simhash approximates UNIGRAM token-set similarity — every flagged
    // pair must have a genuinely high token-set jaccard
    val tokenSets = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toSet).toMap
    val lowSim = sim.map { r =>
      val a = tokenSets(r.getAs[Long]("d1")); val b = tokenSets(r.getAs[Long]("d2"))
      (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        a.intersect(b).size.toDouble / a.union(b).size)
    }.filter(_._3 < 0.8)
    assert(lowSim.isEmpty, s"simhash flagged dissimilar pairs: $lowSim")
  }

  test("cosine topk is ordered, bounded, and self-excluded") {
    val rows = Similarity.queries("q42_cosine_topk")(spark, sf).collect()
    assert(rows.length == 20)
    val sims = rows.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(!rows.map(_.getAs[Long]("vec_id")).contains(0L))
  }

  test("ann lsh recalls an injected true near-duplicate of the query") {
    import spark.implicits._
    val e = Tables(spark, sf, "embeddings")
    val q0 = e.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0)
    // a genuinely close vector (cos ≈ 0.9999): q0 slightly perturbed
    val nearDup = q0.zipWithIndex.map { case (v, i) =>
      v + (if (i == 0) 0.01f else 0.0f) }
    val aug = e.unionByName(
      Seq((9999L, nearDup, 0)).toDF("vec_id", "embedding", "label"))
    val res = Similarity.annLsh(aug, queryId = 0L, k = 10).collect()
    val top = res.head
    assert(top.getAs[Long]("vec_id") == 9999L,
      s"near-dup not ranked first: ${res.take(3).mkString(", ")}")
    assert(top.getAs[Double]("cos_sim") > 0.999)
    assert(res.length <= 10)
    assert(res.forall(r => math.abs(r.getAs[Double]("cos_sim")) <= 1.0001))
  }

  test("multimodal PNG decode round-trips the synthesized headers, deterministically") {
    val media = Multimodal.synthesizePng(Tables(spark, sf, "documents"))
    val a = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.zip(b).forall { case (x, y) =>
      x.doc_id == y.doc_id && x.n_bytes == y.n_bytes &&
      x.features.sameElements(y.features) })
    // parsed dimensions must equal the arithmetic the header encodes
    assert(a.forall(m => m.width == 1 + (m.doc_id % 1920).toInt))
    assert(a.forall(_.features.length == Multimodal.FeatureDim))
    assert(a.forall(_.features.forall(f => f >= 0f && f < 1f)))
  }

  test("lenient decode quarantines corrupt payloads — including NULL — instead of failing") {
    import spark.implicits._
    val good = Multimodal.synthesizePng(Tables(spark, sf, "documents").limit(5))
    val bad = Seq((9001L, Array[Byte](1, 2, 3)), (9002L, Array.fill[Byte](40)(0)))
      .toDF("doc_id", "payload")
      // a NULL payload cell is the classic poison pill — must quarantine,
      // not NPE the task
      .unionByName(Seq(9003L).toDF("doc_id")
        .withColumn("payload", lit(null).cast("binary")))
    val attempts = Multimodal.extractFeaturesLenient(spark, good.unionByName(bad))
    val decoded = attempts.filter(_.features.isDefined)
    val quarantined = attempts.filter(_.error.isDefined)
    assert(decoded.count() == 5)
    val q = quarantined.collect().map(a => a.doc_id -> a.error.get).toMap
    assert(q.keySet == Set(9001L, 9002L, 9003L))
    assert(q(9001L).contains("PNG") && q(9002L).contains("PNG"))
    assert(q(9003L).nonEmpty)
  }

  test("PNG decode rejects a malformed payload instead of fabricating metadata") {
    intercept[Exception] {
      Multimodal.decodePng(1L, Array[Byte](1, 2, 3))
    }
    // valid signature but wrong first chunk must also throw
    val bogus = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      Array.fill[Byte](30)(0)
    intercept[Exception] { Multimodal.decodePng(2L, bogus) }
  }

  test("MP4 box walk quarantines adversarial containers — size-0 box, lying size, truncation") {
    import spark.implicits._
    def be4(n: Long): Array[Byte] =
      Array(((n >> 24) & 0xff).toByte, ((n >> 16) & 0xff).toByte,
        ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be4(body.length + 8L) ++ typ.getBytes("ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be4(0x200))
    val mvhd = box("mvhd",
      be4(0) ++ be4(0) ++ be4(0) ++ be4(700) ++ be4(12345) ++
        be4(0x00010000) ++ Array[Byte](1, 0) ++ Array.fill[Byte](70)(0) ++ be4(2))
    val good = ftyp ++ box("moov", mvhd) ++ box("mdat", "hello".getBytes)
    // a size-0 box pins the walk at a non-moov offset: the 8-hop bound
    // must terminate and the type re-check must quarantine, not misparse
    val sizeZero = ftyp ++ be4(0) ++ "free".getBytes ++ box("moov", mvhd)
    // a size field pointing past the end must quarantine via the
    // length guard, not read garbage
    val lyingSize = ftyp ++ be4(1 << 20) ++ "free".getBytes ++ box("moov", mvhd)
    val truncated = good.take(10)
    val rows = Seq(1L -> good, 2L -> sizeZero, 3L -> lyingSize, 4L -> truncated)
      .toDF("doc_id", "payload")
    val out = Multimodal.parseMp4(rows).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("format") == "mp4")
    assert(out(1L).getAs[Long]("timescale") == 700L)
    assert(out(1L).getAs[Long]("duration") == 12345L)
    assert(out(1L).getAs[Long]("media_bytes") == 5L)
    assert(out(1L).getAs[Long]("duration_ms") == 12345L * 1000 / 700)
    Seq(2L, 3L, 4L).foreach { id =>
      assert(out(id).getAs[String]("format") == "quarantined",
        s"doc $id must quarantine")
    }
  }

  test("WAV little-endian fields survive the byte round-trip at every doc") {
    val out = Multimodal.queries("q105_wav_meta")(spark, sf).collect()
    assert(out.length == 500, "tag filters must not drop any synthesized payload")
    assert(out.forall { r =>
      val id = r.getAs[Long]("doc_id")
      r.getAs[Long]("sample_rate") == 8000 + 100 * (id % 81) &&
        r.getAs[Long]("channels") == 1 + id % 2 &&
        r.getAs[Long]("bits") == 16L
    })
  }

  test("heavy hitters stay exact when the stream is diluted across many partitions") {
    import spark.implicits._
    // one token barely above 1/64 support, spread thin over 50
    // partitions — per-partition counts are tiny, so this catches a
    // sketch whose decrement bound (n_p/(k+1)) is mis-sized vs the
    // global threshold (n/k)
    val n = 64000
    val hot = (1 to (n / 64 + 50)).map(_ => "hot")
    val noise = (1 to (n - hot.size)).map(i => s"tok${i % 8000}")
    val docs = scala.util.Random.shuffle(hot ++ noise)
      .grouped(40).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(50)
    docs.createOrReplaceTempView("hh_docs")
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val exact = toks.groupBy("tok").count()
      .filter(col("count") > n / 64.0).collect().map(_.getString(0)).toSet
    assert(exact.contains("hot"))
    // the same sketch q110 uses, against this adversarial layout
    val candidates = TextAnalysis.misraGriesCandidates(toks.as[String], 64)
    val got = toks.join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy("tok").count().filter(col("count") > n / 64.0)
      .collect().map(_.getString(0)).toSet
    assert(got == exact, s"missed: ${exact.diff(got)}, extra: ${got.diff(exact)}")
  }

  test("text quality scores are in [0,1] and langid is total") {
    val q = TextAnalysis.queries("q39_text_quality")(spark, sf).collect()
    assert(q.forall { r =>
      val s = r.getAs[Double]("quality_score"); s >= 0.0 && s <= 1.0 })
    val lid = TextAnalysis.queries("q41_langid")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(lid == 500L, "every document must receive a prediction")
  }

  test("kmeans: total assignment, k x d output, and centroids = assigned means") {
    val out = Similarity.queries("q122_kmeans")(spark, sf).collect()
    val d = 64; val k = 8
    assert(out.length == k * d, s"expected $k x $d coordinate rows, got ${out.length}")
    // every vector is assigned to exactly one cell
    val total = Tables(spark, sf, "embeddings").count()
    val sizes = out.groupBy(_.getAs[Long]("cent_id"))
      .map { case (c, rows) => c -> rows.map(_.getAs[Long]("n")).distinct }
    sizes.values.foreach(ns => assert(ns.length == 1, "n must be constant per cell"))
    assert(sizes.values.map(_.head).sum == total,
      s"cluster sizes must partition the corpus ($total)")
    // coordinates are finite and bounded by the data's scale
    out.foreach { r =>
      val c = r.getAs[Double]("coord")
      assert(!c.isNaN && !c.isInfinite && math.abs(c) < 100, r.toString)
    }
    // determinism: a second run reproduces the exact same table
    val again = Similarity.queries("q122_kmeans")(spark, sf).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)),
      "kmeans must be bit-deterministic across runs")
  }
}
