package graft

import org.apache.spark.sql.functions._

/** Semantic property pins for the round-12 wave — the invariants each
  * operator exists to provide, beyond the value-level oracle gate:
  *
  *  - q387: the k-occurrence histogram CENSUSES the whole embedding
  *    table (zero-occurrence vectors included) and its mean cannot
  *    exceed 10 (each vector contributes at most 10 list slots);
  *  - q388: the catalog rows are genuine boilerplate (count ≥ 2),
  *    at most 20, count-descending, and char_mass is exactly
  *    count × chunk length;
  *  - q389: hamming lives in [0, 16] for a 16-bit signature, shares
  *    in [0, 1], and the per-band cosine envelope is ordered
  *    min ≤ mean ≤ max;
  *  - q390: the deciles partition the corpus and rates live in [0, 1];
  *  - q391: every source's sample is exactly min(50, n_docs) and the
  *    gap column is the |sample − stratum| mean-chars difference;
  *  - q392: RBO is bounded by the truncated-sum maximum 1 − 0.9⁵⁰ and
  *    the grid is the full source-pair triangle;
  *  - q393: the pass/killed pair counts partition the stored pairs
  *    and filtering first can only SHRINK the dedup drop set.
  */
class Round12WaveSpec extends SparkSuite {

  private val sf01 = "/root/testdata/sf0.01"

  test("q387: the histogram censuses every vector and mean occurrence <= 10") {
    val rows = SparkEntry.queries("q387_hubness")(spark, sf01).collect()
    val total = Tables(spark, sf01, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == total,
      "k-occurrence histogram must census the whole embedding table")
    val mass = rows.map(r =>
      r.getAs[Long]("k_occurrence") * r.getAs[Long]("n_vectors")).sum
    assert(mass <= 10L * total,
      "total occurrence mass exceeds 10 slots per vector")
    assert(rows.forall(_.getAs[Long]("k_occurrence") >= 0L))
  }

  test("q388: catalog rows are real boilerplate with exact char mass") {
    val rows = SparkEntry.queries("q388_boilerplate_catalog")(spark, sf01)
      .collect()
    assert(rows.length <= 20)
    assert(rows.nonEmpty, "sf0.01 carries duplicated chunks — empty catalog " +
      "means the chunking or the fetch-back broke")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_occurrences")
      assert(n >= 2L)
      assert(r.getAs[Long]("n_docs") <= n)
      assert(r.getAs[Long]("char_mass") ==
        n * r.getAs[String]("chunk_text").length,
        "char_mass must be occurrences x chunk length")
    }
    rows.map(_.getAs[Long]("n_occurrences")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, "catalog must be count-descending")
      case _ => ()
    }
  }

  test("q389: hamming bands are bounded and the cosine envelope is ordered") {
    val rows = SparkEntry.queries("q389_srp_calibration")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("hamming")
      assert(h >= 0L && h <= 16L, s"hamming $h outside the 16-bit range")
      val share = r.getAs[Double]("ge03_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Double]("cos_min") <= r.getAs[Double]("cos_mean") + 1e-9)
      assert(r.getAs[Double]("cos_mean") <= r.getAs[Double]("cos_max") + 1e-9)
    }
  }

  test("q390: deciles partition the corpus, rates bounded") {
    val rows = SparkEntry.queries("q390_dup_decile_trend")(spark, sf01)
      .collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables(spark, sf01, "documents").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
      val rate = r.getAs[Double]("dup_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      val d = r.getAs[Long]("decile")
      assert(d >= 0L && d <= 9L)
    }
  }

  test("q391: every source samples exactly min(50, n) docs") {
    val rows = SparkEntry.queries("q391_sample_audit")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sample") ==
        math.min(50L, r.getAs[Long]("n_docs")),
        s"source ${r.getAs[String]("source")} sample size off")
      assert(math.abs(r.getAs[Double]("abs_gap") -
        math.abs(r.getAs[Double]("mean_chars_sample") -
          r.getAs[Double]("mean_chars_all"))) < 2e-6,
        "abs_gap must be the |sample − stratum| mean difference")
    }
  }

  test("q392: RBO bounded by the truncated maximum over the full pair grid") {
    val rows = SparkEntry.queries("q392_vocab_rbo")(spark, sf01).collect()
    val nSrc = Tables(spark, sf01, "documents")
      .select(col("source")).distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2,
      "RBO matrix must cover the full source-pair triangle")
    val maxRbo = 1.0 - math.pow(0.9, 50)
    rows.foreach { r =>
      val v = r.getAs[Double]("rbo")
      assert(v >= 0.0 && v <= maxRbo + 1e-9,
        s"rbo $v outside [0, ${maxRbo}]")
    }
  }

  test("q394: norm envelope ordered, census complete") {
    val rows = SparkEntry.queries("q394_norm_census")(spark, sf01).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum ==
      Tables(spark, sf01, "embeddings").count())
    rows.foreach { r =>
      assert(r.getAs[Double]("norm_min") <= r.getAs[Double]("norm_mean") + 1e-9)
      assert(r.getAs[Double]("norm_mean") <= r.getAs[Double]("norm_max") + 1e-9)
      assert(r.getAs[Long]("n_below_half_mean") <= r.getAs[Long]("n_vectors"))
    }
  }

  test("q395: information identities hold") {
    val r = SparkEntry.queries("q395_source_lang_mi")(spark, sf01).head()
    val (mi, hl) = (r.getAs[Double]("mi"), r.getAs[Double]("h_lang"))
    assert(mi >= -1e-9, "mutual information cannot be negative")
    assert(mi <= hl + 1e-9, "I(source; lang) cannot exceed H(lang)")
    assert(math.abs(r.getAs[Double]("h_lang_given_source") - (hl - mi)) < 2e-6)
    val nm = r.getAs[Double]("mi_normalized")
    assert(nm >= -1e-9 && nm <= 1.0 + 1e-9)
  }

  test("q396: shares bounded, delta consistent, z signed with delta") {
    val rows = SparkEntry.queries("q396_token_drift")(spark, sf01).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val (s1, s2) = (r.getAs[Double]("share_1"), r.getAs[Double]("share_2"))
      assert(s1 >= 0 && s1 <= 1 && s2 >= 0 && s2 <= 1)
      val d = r.getAs[Double]("share_delta")
      assert(math.abs(d - (s2 - s1)) < 2e-6)
      if (math.abs(d) > 1e-6)
        assert(d * r.getAs[Double]("z") > 0, "z must carry the delta's sign")
    }
  }

  test("q397: length bands are powers of two and census the corpus") {
    val rows = SparkEntry.queries("q397_length_dup_rate")(spark, sf01).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables(spark, sf01, "documents").count())
    rows.foreach { r =>
      val b = r.getAs[Long]("len_band")
      assert(b > 0 && (b & (b - 1)) == 0L, s"band $b is not a power of two")
      val rate = r.getAs[Double]("dup_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q398: trigram support never exceeds occurrences; cut bounded") {
    val rows = SparkEntry.queries("q398_event_trigrams")(spark, sf01).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_occurrences"))
      assert(r.getAs[String]("tri").count(_ == '>') == 2,
        "trigram key must join exactly three types")
    }
  }

  test("q399: cell census is k-bounded and imbalance >= 1") {
    val r = SparkEntry.queries("q399_ivf_balance")(spark, sf01).head()
    assert(r.getAs[Long]("n_cells") <= 16L)
    assert(r.getAs[Long]("cell_min") <= r.getAs[Long]("cell_max"))
    assert(r.getAs[Long]("n_vectors") ==
      Tables(spark, sf01, "embeddings").count())
    assert(r.getAs[Double]("imbalance") >= 1.0 - 1e-9)
  }

  test("q400: agreement counts are set-consistent") {
    val rows = SparkEntry.queries("q400_outlier_screen_agreement")(spark, sf01)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_both") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("q401: the TPC-H fixture is referentially intact on all seven edges") {
    val rows = SparkEntry.queries("q401_fk_orphans")(spark, sf01).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphan") <= r.getAs[Long]("n_child"))
      assert(r.getAs[Long]("n_orphan") == 0L,
        s"fixture FK edge ${r.getAs[String]("fk_edge")} has orphans — " +
          "either the generator broke or the edge definition is wrong")
    }
  }

  test("q393: pass/killed partition the pairs; filtering first shrinks dedup work") {
    val r = SparkEntry.queries("q393_filter_dedup_order")(spark, sf01).head()
    assert(r.getAs[Long]("n_pairs_both_pass") +
      r.getAs[Long]("n_pairs_filter_killed") == r.getAs[Long]("n_pairs"))
    assert(r.getAs[Long]("drops_filter_first") <=
      r.getAs[Long]("drops_dedup_first"))
    val saved = r.getAs[Double]("dedup_work_saved")
    assert(saved >= 0.0 && saved <= 1.0)
  }
}
