package graft

import org.apache.spark.sql.functions._

/** Semantic property pins for the round-13 wave — the invariants each
  * operator exists to provide, beyond the value-level oracle gate:
  *
  *  - q402: the per-source rows CENSUS the corpus (Σ n_docs = corpus),
  *    the observed adjacency cannot exceed the corpus's n−1 adjacent
  *    slots, and every fixture source is populous enough to carry a
  *    defined mixing ratio;
  *  - q403: both winner sets are exactly top-20 (overlap ≤ 20), norms
  *    are strictly positive, and a raw-dot ranking can only prefer
  *    equal-or-higher-norm winners on average (the bias the audit
  *    measures — ties allowed);
  *  - q404: reciprocated directed edges come in pairs WITHIN a cell
  *    (even counts), never exceed the out-edge count, and the edge
  *    census respects the rn ≤ 10 cap;
  *  - q405: exclusive mass is a sub-mass (bounded by totals) and the
  *    source rows census every non-empty document;
  *  - q406: raising the threshold can only SHRINK each band's removal
  *    set, and no band loses more tokens than it has;
  *  - q407: the bucket histogram partitions the ≥ 0.5 pair set (shares
  *    sum to 1, counts sum to the store-served pair count) and every
  *    bucket mean sits in [0.5, 1].
  */
class Round13WaveSpec extends SparkSuite {

  private val sf01 = "/root/testdata/sf0.01"

  test("q402: source rows census the corpus and ratios are defined") {
    val rows = SparkEntry.queries("q402_shuffle_mixing_audit")(spark, sf01)
      .collect()
    val total = Tables(spark, sf01, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "per-source doc counts must census the corpus")
    assert(rows.map(_.getAs[Long]("adj_same")).sum <= total - 1,
      "observed same-source adjacencies exceed the corpus's adjacent slots")
    rows.foreach { r =>
      assert(r.getAs[Double]("expected_adj") > 0.0)
      assert(!r.isNullAt(r.fieldIndex("mixing_ratio")),
        s"fixture source ${r.getAs[String]("source")} has n_docs > 1 — " +
          "ratio must be defined")
      assert(r.getAs[Double]("mixing_ratio") >= 0.0)
    }
  }

  test("q403: top-20 winner sets, positive norms, bias direction bounded") {
    val rows = SparkEntry.queries("q403_dot_cosine_rank_bias")(spark, sf01)
      .collect()
    assert(rows.length == 3, "one row per probe vector")
    // GUARD (round-13 ADVICE): mean_norm_dot >= mean_norm_cos is only a
    // theorem when every winner-set cosine is positive (the norm =
    // dot/cos decomposition flips sign otherwise). The winner sets hold
    // the HIGHEST cosines, so "each probe has >= 20 positive-cosine
    // neighbors" is exactly the precondition — verify it on the fixture
    // instead of assuming it.
    val dotE = "aggregate(zip_with(embedding, q_emb, (p, q) -> " +
      "cast(p AS double) * cast(q AS double)), 0D, (acc, v) -> acc + v)"
    val e = Tables(spark, sf01, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val posPerProbe = e.join(
        org.apache.spark.sql.functions.broadcast(e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))),
        col("vec_id") =!= col("q_id"))
      .filter(expr(dotE) > 0)
      .groupBy(col("q_id")).count().collect()
    val guarded = posPerProbe.length == 3 &&
      posPerProbe.forall(_.getAs[Long]("count") >= 20L)
    // round-14 ADVICE: a lost precondition must CANCEL visibly, not
    // silently skip the key assertion inside the row loop
    assume(guarded, "fixture lost the >= 20-positive-cosine-neighbors " +
      "precondition — the norm-bias direction is undefined here; " +
      "regenerate the fixture or re-derive the bound")
    rows.foreach { r =>
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0L && ov <= 20L, s"overlap $ov outside [0, 20]")
      assert(r.getAs[Double]("mean_norm_dot") > 0.0)
      assert(r.getAs[Double]("mean_norm_cos") > 0.0)
      // the audited bias direction: a raw-dot ranking prefers norm, so
      // its winner set's mean norm is >= the cosine set's up to the
      // rounding grid (1e-6); a violation means the rankings swapped
      assert(r.getAs[Double]("mean_norm_dot") >=
        r.getAs[Double]("mean_norm_cos") - 1e-6,
        "dot-ranked winners must not have LOWER mean norm than " +
          "cosine-ranked winners")
    }
  }

  test("q403: a norm-skewed corpus makes the audit report the divergence") {
    // Round-13 verdict What's-wrong #2: on the fixture the embeddings
    // are unit-norm, so dot-top-20 == cos-top-20 and the audit's
    // DISCRIMINATING half was demonstrated nowhere. Synthetic corpus:
    // per probe axis, 25 well-aligned unit vectors (cos ~0.995, dot
    // ~0.995) and 25 mis-aligned vectors at norm 3 (cos ~0.8, dot
    // ~2.4) — a raw-dot ranking MUST prefer the high-norm losers, so
    // the audit must report a small overlap and a strictly positive
    // norm gap. If the audit read "healthy" here, this test fails.
    val dir = java.nio.file.Files.createTempDirectory("graft_q403_skew")
      .toString
    val rows = Seq.newBuilder[(Long, Array[Float], String)]
    // probes: the three axes (unit)
    (0 until 3).foreach { q =>
      val v = Array.fill(4)(0f); v(q) = 1f
      rows += ((q.toLong, v, "probe"))
    }
    var id = 3L
    (0 until 3).foreach { q =>
      (0 until 25).foreach { i =>
        // aligned, unit norm: axis + tiny orthogonal jitter
        val v = Array.fill(4)(0f); v(q) = 1f; v((q + 1) % 4) = 0.1f * (i % 3)
        val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
        rows += ((id, v.map(_ / n), s"aligned_$q")); id += 1
      }
      (0 until 25).foreach { i =>
        // mis-aligned (cos ~0.8) but norm 3: dot beats every aligned one
        val v = Array.fill(4)(0f); v(q) = 0.8f; v((q + 2) % 4) = 0.6f + 0.001f * (i % 5)
        val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
        rows += ((id, v.map(x => 3f * x / n), s"skewed_$q")); id += 1
      }
    }
    import spark.implicits._
    rows.result().toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val audit = SparkEntry.queries("q403_dot_cosine_rank_bias")(spark, dir)
      .collect()
    assert(audit.length == 3)
    audit.foreach { r =>
      assert(r.getAs[Long]("n_overlap") < 20L,
        "the audit must NOT report full overlap on a norm-skewed corpus")
      assert(r.getAs[Double]("mean_norm_dot") >
        r.getAs[Double]("mean_norm_cos") + 0.1,
        "the audit must report a strictly positive norm gap on a " +
          "norm-skewed corpus")
    }
  }

  test("q404: reciprocated edges are even, capped, and rate-bounded") {
    val rows = SparkEntry.queries("q404_mutual_knn_rate")(spark, sf01)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nm = r.getAs[Long]("n_mutual_directed")
      val ne = r.getAs[Long]("n_edges")
      val nv = r.getAs[Long]("n_vectors")
      assert(nm % 2 == 0,
        "a reciprocated within-cell edge contributes BOTH directions")
      assert(nm <= ne)
      assert(ne <= 10L * nv, "rn <= 10 cap violated")
      val rate = r.getAs[Double]("mutual_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    val census = rows.map(_.getAs[Long]("n_vectors")).sum
    assert(census <= Tables(spark, sf01, "embeddings").count())
  }

  test("q405: exclusive mass is a bounded sub-mass over a full census") {
    val rows = SparkEntry.queries("q405_rare_token_mass")(spark, sf01)
      .collect()
    // the query's census is docs with >= 1 NON-EMPTY token after the
    // whitespace split (round-13 ADVICE: a whitespace-only doc has
    // length(text) > 0 but zero tokens, and must not be expected here)
    val nonEmpty = Tables(spark, sf01, "documents")
      .filter(col("text").isNotNull &&
        expr("size(filter(split(text, ' '), x -> x <> ''))") > 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nonEmpty,
      "source rows must census every non-empty document")
    rows.foreach { r =>
      assert(r.getAs[Long]("exclusive_tokens") <= r.getAs[Long]("total_tokens"))
      val m = r.getAs[Double]("exclusive_mass")
      assert(m >= 0.0 && m <= 1.0)
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q406: a higher threshold only shrinks each band's removal set") {
    val rows = SparkEntry.queries("q406_dedup_threshold_regret")(spark, sf01)
      .collect()
    assert(rows.nonEmpty && rows.length <= 12)
    rows.foreach { r =>
      assert(r.getAs[Long]("tokens_removed") <= r.getAs[Long]("band_tokens"))
      assert(r.getAs[Long]("n_removed") <= r.getAs[Long]("band_docs"))
      val s = r.getAs[Double]("band_mass_share")
      assert(s >= 0.0 && s <= 1.0)
    }
    rows.groupBy(_.getAs[String]("band")).foreach { case (_, rs) =>
      rs.sortBy(_.getAs[Double]("threshold")).map(_.getAs[Long]("n_removed"))
        .toSeq.sliding(2).foreach {
          case Seq(lo, hi) => assert(hi <= lo,
            "raising the Jaccard cut must not GROW a band's removals")
          case _ => ()
        }
    }
  }

  test("q408: G-squared scores are non-negative, supported, descending") {
    val rows = SparkEntry.queries("q408_llr_collocations")(spark, sf01)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("k11") >= 5L, "support floor violated")
      assert(r.getAs[Double]("llr") >= 0.0,
        "G-squared against MLE marginals cannot be negative")
    }
    rows.map(_.getAs[Double]("llr")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, "top-20 must be score-descending")
      case _ => ()
    }
  }

  test("q409: interpolated perplexities are positive over every source") {
    val rows = SparkEntry.queries("q409_interpolated_ppl")(spark, sf01)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") > 0L)
      assert(r.getAs[Double]("ppl_jm") > 0.0)
      assert(r.getAs[Double]("ppl_uni") > 0.0)
      assert(r.getAs[Double]("order_gain") > 0.0)
    }
  }

  test("q410: fan-out buckets census parents and children exactly") {
    val rows = SparkEntry.queries("q410_fk_fanout_profile")(spark, sf01)
      .collect()
    val perOrder = rows.filter(_.getAs[String]("fk_edge") == "lineitems_per_order")
    assert(perOrder.map(_.getAs[Long]("n_parents")).sum ==
      Tables(spark, sf01, "orders").count(),
      "buckets must census every order")
    assert(perOrder.map(_.getAs[Long]("n_children")).sum ==
      Tables(spark, sf01, "lineitem").count(),
      "bucket child mass must sum to the lineitem table")
    rows.filter(_.getAs[Long]("bucket") == -1L).foreach { r =>
      assert(r.getAs[Long]("n_children") == 0L,
        "the -1 bucket is the zero-children census")
    }
  }

  test("q411: the stationary vector is a probability distribution") {
    val rows = SparkEntry.queries("q411_markov_stationary")(spark, sf01)
      .collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getAs[Double]("stationary_p")).sum
    assert(math.abs(mass - 1.0) < 1e-3,
      s"stationary mass $mass must be ~1 (every to-type is a from-type " +
        "on this fixture)")
    rows.foreach(r => assert(r.getAs[Double]("stationary_p") >= 0.0))
  }

  test("q412: overlaps are bounded by the smaller audience") {
    val rows = SparkEntry.queries("q412_event_audience_overlap")(spark, sf01)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ni, s1, s2) = (r.getAs[Long]("n_inter"),
        r.getAs[Long]("s1"), r.getAs[Long]("s2"))
      assert(ni <= math.min(s1, s2))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("q407: buckets partition the pair set and means sit in [0.5, 1]") {
    val rows = SparkEntry.queries("q407_dup_distance_profile")(spark, sf01)
      .collect()
    assert(rows.nonEmpty)
    val served = llm.PairGraph.jaccard(spark, sf01, 0.5).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == served,
      "bucket counts must partition the store-served >= 0.5 pair set")
    val shareSum = rows.map(_.getAs[Double]("pair_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3,
      s"pair shares sum to $shareSum, expected ~1")
    rows.foreach { r =>
      val mj = r.getAs[Double]("mean_jaccard")
      assert(mj >= 0.5 - 1e-9 && mj <= 1.0 + 1e-9)
      assert(r.getAs[Long]("gap_bucket") >= 0L)
    }
  }
}
