package graft

import org.apache.spark.sql.functions._

/** Semantic property pins for the round-11 second wave — the
  * invariants each operator exists to provide, beyond the value-level
  * oracle gate:
  *
  *  - q365: every source's kept token mass respects its quota, the
  *    quota IS the integer 30% of the source's token total, and the
  *    fill is MAXIMAL (greedy by quality — adding the best rejected
  *    doc would overflow; checked via fill bound + doc-level replay
  *    on the spec fixture).
  *  - q366: post-dedup masses never exceed pre, the post shares sum
  *    to 1, and the delta column is exactly post − pre.
  *  - q367: closures never exceed wedges, rates live in [0, 1], and
  *    bands are powers of two ≤ 64.
  *  - q368: the confusion matrix partitions exactly the classified
  *    test docs (odd ids with ≥ 1 in-vocab token), and predictions
  *    stay inside the source domain.
  *  - q369: overlaps are bounded by the 8-token probe, stitched
  *    pairs never exceed adjacent pairs.
  */
class Round11WaveSpec extends SparkSuite {

  // sf0.01: the sf0.001 pair graph is tiny enough to make q366/q367
  // degenerate (no drops / no wedges)
  private val sf01 = "/root/testdata/sf0.01"

  test("q361: pair volume and drop mass shrink as the threshold rises") {
    val rows = SparkEntry.queries("q361_dedup_threshold_curve")(spark, sf01)
      .orderBy(col("threshold")).collect()
    assert(rows.length == 5)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_pairs") <= a.getAs[Long]("n_pairs"))
        assert(b.getAs[Long]("n_docs_dropped") <= a.getAs[Long]("n_docs_dropped"))
        assert(b.getAs[Long]("chars_dropped") <= a.getAs[Long]("chars_dropped"))
      case _ => ()
    }
    rows.foreach(r => assert(r.getAs[Double]("drop_share") >= 0.0 &&
      r.getAs[Double]("drop_share") <= 1.0))
  }

  test("q362: candidate set grows with nprobe and recall never falls") {
    val rows = SparkEntry.queries("q362_ivf_nprobe_curve")(spark, sf01)
      .orderBy(col("nprobe")).collect()
    assert(rows.length == 4)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_scanned") >= a.getAs[Long]("n_scanned"),
          "candidate set shrank as nprobe grew")
        assert(b.getAs[Double]("recall_at_10") >=
          a.getAs[Double]("recall_at_10") - 1e-9,
          "recall fell as nprobe grew — candidate nesting broke")
      case _ => ()
    }
  }

  test("q363: posting mass and pair volume grow with the cap") {
    val rows = SparkEntry.queries("q363_dfcap_planner")(spark, sf01)
      .orderBy(col("cap")).collect()
    assert(rows.length >= 3)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("postings_kept") >= a.getAs[Long]("postings_kept"))
        assert(b.getAs[Long]("pair_join_volume") >=
          a.getAs[Long]("pair_join_volume"))
      case _ => ()
    }
  }

  test("q364: chunk-dup shares are rates; dup chunks bounded by chunks") {
    val rows = SparkEntry.queries("q364_chunk_dedup")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_chunks") <= r.getAs[Long]("n_chunks"))
      val s = r.getAs[Double]("dup_chunk_share")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Long]("n_docs_with_dup") <= r.getAs[Long]("n_chunks"))
    }
  }

  test("q365: quota arithmetic, budget respected, greedy fill maximal") {
    val rows = SparkEntry.queries("q365_quota_select")(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent per-source token totals (the q40 whitespace count)
    val tots = Tables(spark, sf, "documents")
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("tot"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("tot"))
      .toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val quota = r.getAs[Long]("quota_tokens")
      val kept = r.getAs[Long]("tokens_kept")
      assert(quota == tots(src) * 3 / 10, s"$src quota != 30% of ${tots(src)}")
      assert(kept <= quota, s"$src kept $kept over quota $quota")
      assert(r.getAs[Long]("n_docs_kept") > 0, s"$src kept no docs")
    }
    // maximality: replay the greedy order for one source and check the
    // kept set is exactly the maximal quality-ordered prefix
    val src0 = rows.head.getAs[String]("source")
    val docs = Tables(spark, sf, "documents")
      .filter(col("source") === src0)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"),
        (lit(0.5) * (size(array_distinct(split(col("text"), " "))) /
          size(split(col("text"), " ")).cast("double")) +
          lit(0.3) * (lit(1.0) -
            size(expr("filter(split(text, ' '), t -> t IN ('the', 'a'))")) /
              size(split(col("text"), " ")).cast("double")) +
          lit(0.2) * least(size(split(col("text"), " ")).cast("double") / 100.0,
            lit(1.0))).as("q"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("nt"),
        r.getAs[Double]("q")))
      .sortBy { case (id, _, q) => (-q, id) }
    val quota0 = tots(src0) * 3 / 10
    var cum = 0L; var nKept = 0L; var tKept = 0L
    docs.foreach { case (_, nt, _) =>
      cum += nt; if (cum <= quota0) { nKept += 1; tKept += nt } }
    val row0 = rows.find(_.getAs[String]("source") == src0).get
    assert(row0.getAs[Long]("n_docs_kept") == nKept &&
      row0.getAs[Long]("tokens_kept") == tKept,
      s"greedy replay disagrees for $src0: " +
        s"(${row0.getAs[Long]("n_docs_kept")}, ${row0.getAs[Long]("tokens_kept")})" +
        s" vs ($nKept, $tKept)")
  }

  test("q366: dedup only removes mass and shares stay a distribution") {
    val rows = SparkEntry.queries("q366_dedup_mix_shift")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_post") <= r.getAs[Long]("n_docs_pre"))
      assert(r.getAs[Long]("chars_post") <= r.getAs[Long]("chars_pre"))
      assert(math.abs(r.getAs[Double]("share_delta") -
        (r.getAs[Double]("share_post") - r.getAs[Double]("share_pre"))) < 2e-6)
    }
    assert(math.abs(rows.map(_.getAs[Double]("share_pre")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("share_post")).sum - 1.0) < 1e-4)
    // the fixture's pair graph is non-empty, so SOME source lost docs
    assert(rows.exists(r =>
      r.getAs[Long]("n_docs_post") < r.getAs[Long]("n_docs_pre")),
      "no source lost any doc — pair graph unexpectedly empty")
  }

  test("q367: closure counts are coherent and bands are pow-2 <= 64") {
    val rows = SparkEntry.queries("q367_transitivity_audit")(spark, sf01)
      .collect()
    assert(rows.nonEmpty, "no wedges at sf0.01 — fixture degenerate")
    rows.foreach { r =>
      val w = r.getAs[Long]("n_wedges"); val c = r.getAs[Long]("n_closed")
      val band = r.getAs[Long]("deg_band")
      assert(c <= w, s"band $band: closed $c > wedges $w")
      val rate = r.getAs[Double]("closure_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(band >= 1 && band <= 64 && (band & (band - 1)) == 0,
        s"deg_band $band not a pow-2 in [1, 64]")
    }
  }

  test("q368: confusion matrix partitions the classified test docs") {
    val rows = SparkEntry.queries("q368_source_classifier")(spark, sf).collect()
    assert(rows.nonEmpty)
    val srcDomain = Tables(spark, sf, "documents")
      .select(col("source")).distinct().collect()
      .map(_.getAs[String]("source")).toSet
    rows.foreach { r =>
      assert(srcDomain.contains(r.getAs[String]("pred_source")))
      assert(srcDomain.contains(r.getAs[String]("true_source")))
      assert(r.getAs[Long]("n") > 0)
    }
    // total classified = odd-id docs with >= 1 token in the count>=2
    // train vocabulary — recomputed independently
    val tok = Tables(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val vocab = tok.filter(col("doc_id") % 2 === 0)
      .groupBy(col("t")).agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("t"))
    val expected = tok.filter(col("doc_id") % 2 =!= 0)
      .join(vocab, "t").select(col("doc_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected,
      s"confusion total != $expected classified docs")
  }

  test("q369: overlap probe bounds hold") {
    val rows = SparkEntry.queries("q369_boundary_stitch")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_overlap") <= 8)
      assert(r.getAs[Long]("n_stitched") <= r.getAs[Long]("n_adjacent"))
      assert(r.getAs[Long]("n_adjacent") > 0)
    }
  }

  test("q370: unique fails bounded by fails; pass count coherent") {
    val rows = SparkEntry.queries("q370_drop_attribution")(spark, sf).collect()
    assert(rows.length == 4)
    val nDocs = rows.head.getAs[Long]("n_docs")
    val pass = rows.head.getAs[Long]("n_pass_all")
    assert(pass <= nDocs)
    rows.foreach { r =>
      val f = r.getAs[Long]("n_fail"); val u = r.getAs[Long]("n_unique_fail")
      assert(u <= f && f <= nDocs,
        s"${r.getAs[String]("filter")}: unique $u > fail $f or fail > $nDocs")
      // a doc failing ONLY this filter is not in pass_all, and every
      // filter's unique drops are disjoint from every other's
      assert(pass + u <= nDocs)
    }
    assert(pass + rows.map(_.getAs[Long]("n_unique_fail")).sum <= nDocs)
  }

  test("q371: fill curve is monotone in budget") {
    val rows = SparkEntry.queries("q371_budget_fill_curve")(spark, sf)
      .orderBy(col("budget_pct")).collect()
    assert(rows.length == 5)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_docs_kept") >= a.getAs[Long]("n_docs_kept"))
        assert(b.getAs[Long]("tokens_kept") >= a.getAs[Long]("tokens_kept"))
        // a larger budget reaches DEEPER into the quality ranking
        assert(b.getAs[Double]("min_quality_kept") <=
          a.getAs[Double]("min_quality_kept") + 1e-9)
      case _ => ()
    }
    rows.foreach { r =>
      val fr = r.getAs[Double]("fill_rate")
      assert(fr >= 0.0 && fr <= 1.0 + 1e-9, s"fill_rate $fr out of [0,1]")
    }
  }

  test("q372: partition plan scales with data and stays >= 1") {
    val rows = SparkEntry.queries("q372_partition_planner")(spark, sf).collect()
    assert(rows.length == 12) // 4 tables x {1,100,1000}
    rows.foreach { r =>
      assert(r.getAs[Long]("parts_256mb") >= 1)
      assert(r.getAs[Long]("est_bytes") > 0)
    }
    rows.groupBy(_.getAs[String]("table_name")).foreach { case (t, rs) =>
      val byScale = rs.sortBy(_.getAs[Long]("scale"))
        .map(_.getAs[Long]("parts_256mb"))
      assert(byScale.sliding(2).forall { case Array(a, b) => b >= a
      case _ => true }, s"$t partitions not monotone in scale")
    }
  }

  test("q373: lateness census coherent under the replay permutation") {
    val rows = SparkEntry.queries("q373_watermark_planner")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_late") <= r.getAs[Long]("n_events"))
      val share = r.getAs[Double]("late_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Double]("avg_late_delay_s") * 1e6 <=
        r.getAs[Long]("max_delay_us") + 1.0)
    }
    // the content-hash permutation reorders aggressively — lateness
    // must actually appear or the planner demonstrates nothing
    assert(rows.map(_.getAs[Long]("n_late")).sum > 0,
      "no late events under the replay permutation")
  }

  test("q375: eccentricities cover every clustered doc, ecc >= 1") {
    val rows = SparkEntry.queries("q375_cluster_diameter")(spark, sf01)
      .collect()
    assert(rows.nonEmpty, "no near-dup clusters at sf0.01")
    rows.foreach { r =>
      assert(r.getAs[Long]("ecc") >= 1,
        "a multi-doc cluster cannot have eccentricity 0")
      assert(r.getAs[Long]("n_docs") >= 2 * r.getAs[Long]("n_clusters"),
        "every cluster has at least 2 members")
    }
    // every doc that appears in a >= 0.8 pair is in exactly one cluster
    val clustered = graft.llm.PairGraph.jaccard(spark, sf01, 0.8)
      .select(explode(array(col("d1"), col("d2"))).as("d"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == clustered,
      "eccentricity census lost or double-counted clustered docs")
  }

  test("q376: novelty decays and types total the vocabulary") {
    val rows = SparkEntry.queries("q376_vocab_growth_curve")(spark, sf)
      .orderBy(col("decile")).collect()
    assert(rows.length == 10, s"expected 10 deciles, got ${rows.length}")
    val vocab = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_new_types")).sum == vocab)
    // the first decile introduces the most types (everything is new)
    val news = rows.map(_.getAs[Long]("n_new_types"))
    assert(news.head == news.max,
      "decile 0 must introduce at least as many new types as any other")
    rows.foreach { r =>
      val rate = r.getAs[Double]("novelty_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q377: Huber location lands inside the data range, weights work") {
    val rows = SparkEntry.queries("q377_huber_location")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bounds = Tables(spark, sf, "events").filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("event_type"))
      val mu = r.getAs[Double]("huber_mu")
      assert(mu >= lo - 1e-6 && mu <= hi + 1e-6,
        s"huber_mu $mu outside data range [$lo, $hi]")
      // the robust estimate moved off the raw mean by a bounded step
      assert(math.abs(r.getAs[Double]("shift")) <= (hi - lo),
        "IRLS shift exceeds the data range — weights are broken")
    }
  }

  test("q378: CUPED never increases variance; reduction is rho^2") {
    val r = SparkEntry.queries("q378_cuped")(spark, sf).collect().head
    val (raw, adj, red) = (r.getAs[Double]("var_raw"),
      r.getAs[Double]("var_adj"), r.getAs[Double]("var_reduction"))
    assert(adj <= raw + 1e-6, s"CUPED increased variance: $raw -> $adj")
    assert(red >= 0.0 && red <= 1.0)
    assert(math.abs(adj - raw * (1.0 - red)) <= 1e-3 * math.max(raw, 1.0),
      "var_adj != var_raw * (1 - reduction) — the closed form broke")
  }

  test("q379: DiD is exactly the cell-mean contrast; cells partition events") {
    val r = SparkEntry.queries("q379_diff_in_diff")(spark, sf).collect().head
    val did = (r.getAs[Double]("t_post") - r.getAs[Double]("t_pre")) -
      (r.getAs[Double]("c_post") - r.getAs[Double]("c_pre"))
    assert(math.abs(r.getAs[Double]("did") - did) <= 2e-6)
    val nCells = Seq("n_t_pre", "n_t_post", "n_c_pre", "n_c_post")
      .map(r.getAs[Long]).sum
    assert(nCells == Tables(spark, sf, "events").count(),
      "the four DiD cells must partition every event")
  }

  test("q380: base year indexes to 1; Fisher sits between L and P") {
    val rows = SparkEntry.queries("q380_price_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    val base = rows.find(_.getAs[Long]("year") == 1996L).get
    Seq("laspeyres", "paasche", "fisher").foreach { c =>
      assert(math.abs(base.getAs[Double](c) - 1.0) < 1e-6,
        s"base-year $c != 1")
    }
    rows.foreach { r =>
      val (l, p, f) = (r.getAs[Double]("laspeyres"),
        r.getAs[Double]("paasche"), r.getAs[Double]("fisher"))
      assert(f >= math.min(l, p) - 1e-6 && f <= math.max(l, p) + 1e-6,
        s"fisher $f outside [$l, $p]")
    }
  }

  test("q381: calibration bands are coherent and cover the pair store") {
    val rows = SparkEntry.queries("q381_simhash_calibration")(spark, sf01)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, mid, hi) = (r.getAs[Double]("min_jac"),
        r.getAs[Double]("mean_jac"), r.getAs[Double]("max_jac"))
      assert(lo <= mid + 1e-9 && mid <= hi + 1e-9, s"band stats disordered")
      val s = r.getAs[Double]("dup_share")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Long]("ham_band") % 5 == 0)
    }
    // every stored >= 0.5 pair lands in exactly one band
    val stored = graft.llm.PairGraph.jaccard(spark, sf01, 0.5).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == stored)
  }

  test("q382/q383: lang-pair and dup/clean censuses partition the store") {
    val pairRows = SparkEntry.queries("q382_crosslingual_dup")(spark, sf01)
      .collect()
    assert(pairRows.nonEmpty)
    val stored = graft.llm.PairGraph.jaccard(spark, sf01, 0.8).count()
    assert(pairRows.map(_.getAs[Long]("n_pairs")).sum == stored,
      "lang-pair census lost or double-counted stored pairs")
    pairRows.foreach { r =>
      val same = r.getAs[String]("lang_pair").split("-") match {
        case Array(a, b) => a == b; case _ => false }
      assert(r.getAs[Long]("n_cross") ==
        (if (same) 0L else r.getAs[Long]("n_pairs")),
        "cross flag disagrees with the canonical lang-pair key")
    }
    val gapRows = SparkEntry.queries("q383_dup_quality_gap")(spark, sf01)
      .collect()
    val nDocs = Tables(spark, sf01, "documents").count()
    assert(gapRows.map(r => r.getAs[Long]("n_dup_docs") +
      r.getAs[Long]("n_clean_docs")).sum == nDocs,
      "dup/clean split must partition the corpus")
  }

  test("q384: estimators bracket sanely around the true population") {
    val r = SparkEntry.queries("q384_capture_recapture")(spark, sf)
      .collect().head
    val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("m"))
    val truth = r.getAs[Long]("true_distinct")
    assert(m <= math.min(n1, n2) && m > 0)
    val lp = r.getAs[Double]("lincoln_petersen")
    val ch = r.getAs[Double]("chapman")
    // both estimators are at least the larger capture and within a
    // loose factor of the truth on a population everyone revisits
    assert(lp >= math.max(n1, n2) - 1e-6 && ch >= math.max(n1, n2) * 0.5)
    assert(lp <= truth * 10.0 && ch <= truth * 10.0,
      s"estimates ($lp, $ch) implausibly far above truth $truth")
  }

  test("q385: richness estimators are coherent with the vocabulary") {
    val r = SparkEntry.queries("q385_vocab_richness")(spark, sf)
      .collect().head
    val sObs = r.getAs[Long]("s_obs")
    assert(r.getAs[Double]("chao1") >= sObs - 1e-6,
      "Chao1 must not fall below the observed richness")
    val p0 = r.getAs[Double]("unseen_mass")
    assert(p0 >= 0.0 && p0 <= 1.0)
    assert(math.abs(p0 + r.getAs[Double]("coverage") - 1.0) < 2e-6)
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") <= sObs)
  }

  test("q386: jackknife variance is nonnegative; theta matches the mean") {
    val r = SparkEntry.queries("q386_jackknife_sources")(spark, sf)
      .collect().head
    assert(r.getAs[Double]("jack_var") >= -1e-9)
    assert(math.abs(r.getAs[Double]("jack_se") -
      math.sqrt(math.max(0.0, r.getAs[Double]("jack_var")))) < 1e-3)
    val mean = Tables(spark, sf, "documents")
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    assert(math.abs(r.getAs[Double]("theta") - mean) < 1e-4)
  }

  test("q374: broadcast decisions flip monotonically with scale") {
    val rows = SparkEntry.queries("q374_broadcast_planner")(spark, sf).collect()
    assert(rows.length == 15) // 5 dims x {1,100,1000}
    rows.groupBy(_.getAs[String]("table_name")).foreach { case (t, rs) =>
      val byScale = rs.sortBy(_.getAs[Long]("scale"))
      // once a dim stops being broadcastable it never comes back
      val strat = byScale.map(_.getAs[String]("strategy"))
      assert(!strat.sliding(2).exists {
        case Array("shuffle", "broadcast") => true; case _ => false },
        s"$t strategy flipped back to broadcast at a larger scale")
      assert(byScale.map(_.getAs[Long]("scaled_bytes")).sliding(2).forall {
        case Array(a, b) => b >= a; case _ => true })
    }
    // region and nation stay broadcastable at every scale
    Seq("region", "nation").foreach { t =>
      assert(rows.filter(_.getAs[String]("table_name") == t)
        .forall(_.getAs[String]("strategy") == "broadcast"),
        s"$t should broadcast at every scale")
    }
  }
}
