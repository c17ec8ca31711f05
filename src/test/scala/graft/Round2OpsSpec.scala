package graft

import org.apache.spark.sql.functions._
import graft.llm.PipelineOps
import graft.ops.Statistics

/** Invariants for the round-2 operator batch (q63-q81). Cross-engine
  * value correctness is covered by the Verify/DuckDB gate; these pin
  * the algebraic and pipeline-semantic properties the oracle can't
  * express (self-consistency, conservation, determinism). */
class Round2OpsSpec extends SparkSuite {

  test("variance family is internally consistent (var_pop = std_pop², samp ≥ pop relation)") {
    val rows = Statistics.queries("q63_corr_covar")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val varP = r.getAs[Double]("var_p"); val stdP = r.getAs[Double]("std_p")
      assert(math.abs(varP - stdP * stdP) < 1e-2, s"var_pop != std_pop² in $r")
      assert(r.getAs[Double]("var_s") >= varP, "sample variance must exceed population")
      val c = r.getAs[Double]("corr_qp")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("ntile/percent_rank/cume_dist are monotone over the acctbal order") {
    val rows = Statistics.queries("q67_ntile_ranks")(spark, sf)
      .orderBy(col("pct_rank"), col("c_custkey")).collect()
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_.getAs[Long]("quartile")).toSet == Set(1L, 2L, 3L, 4L))
    val pr = rows.map(_.getAs[Double]("pct_rank"))
    assert(pr.head == 0.0 && pr.last == 1.0)
    val cd = rows.map(_.getAs[Double]("cum_dist"))
    assert(cd.zip(cd.tail).forall { case (a, b) => a <= b })
    assert(math.abs(cd.last - 1.0) < 1e-9)
  }

  test("full outer join loses no side: every nation with customers or suppliers appears") {
    val out = Statistics.queries("q69_full_outer")(spark, sf).collect()
    val custNations = Tables(spark, sf, "customer")
      .select(col("c_nationkey")).distinct().collect().map(_.getInt(0)).toSet
    val suppNations = Tables(spark, sf, "supplier")
      .select(col("s_nationkey")).distinct().collect().map(_.getInt(0)).toSet
    assert(out.map(_.getAs[Int]("nationkey")).toSet == custNations.union(suppNations))
    val totalCust = out.flatMap(r => Option(r.getAs[Long]("n_cust"))).sum
    assert(totalCust == Tables(spark, sf, "customer").count())
  }

  test("seq_fold higher-order result matches the closed form n(n+1)(n+2)/6") {
    Statistics.queries("q74_seq_fold")(spark, sf).collect().foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("weighted_sum") == n * (n + 1) * (n + 2) / 6)
    }
  }

  test("dedup_apply conserves counts and drops exactly the near-dup d2 set") {
    val rows = PipelineOps.queries("q75_dedup_apply")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_total")).sum
    assert(total == Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") == r.getAs[Long]("n_total"))
    }
    val dropped = rows.map(_.getAs[Long]("n_dropped")).sum
    val pairsD2 = llm.TextDedup.queries("q35_dedup_minhash")(spark, sf)
      .select(col("d2")).distinct().count()
    assert(dropped == pairsD2, "drop-set must equal the distinct d2 set of verified pairs")
  }

  test("rep_ratio is in [0,1) and detects genuinely repeated shingles") {
    val rows = PipelineOps.queries("q77_rep_ratio")(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("rep_ratio")
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_shingles"))
    }
    // ordering is by ratio desc
    val ratios = rows.map(_.getAs[Double]("rep_ratio"))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
  }

  test("hash sampling is deterministic and in a plausible 1/4 band") {
    val a = PipelineOps.queries("q78_hash_sample")(spark, sf).collect().map(_.toSeq)
    val b = PipelineOps.queries("q78_hash_sample")(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "sha-keyed sampling must be reproducible")
    val sampled = a.map(_(1).asInstanceOf[Long]).sum.toDouble
    val total = Tables(spark, sf, "documents").count().toDouble
    assert(sampled / total > 0.1 && sampled / total < 0.45,
      s"1/4 hex-digit sample rate out of band: ${sampled / total}")
  }

  test("train/val/test split partitions the corpus with no overlap or loss") {
    val rows = PipelineOps.queries("q79_train_split")(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables(spark, sf, "documents").count())
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    val train = rows.filter(_.getAs[String]("split") == "train").map(_.getAs[Long]("n")).sum
    assert(train.toDouble / n > 0.5, "train share should dominate (12/16 of hash space)")
  }

  test("centroid norm per label is in (0,1] for unit-norm inputs and counts all vectors") {
    val rows = PipelineOps.queries("q80_centroid_norm")(spark, sf).collect()
    val nVec = rows.map(_.getAs[Long]("n_vectors")).sum
    assert(nVec == Tables(spark, sf, "embeddings").count())
    rows.foreach { r =>
      val cn = r.getAs[Double]("centroid_norm")
      // Jensen: ||avg(unit vectors)|| ≤ 1; > 0 unless vectors cancel exactly
      assert(cn > 0.0 && cn <= 1.0 + 1e-9, s"centroid norm out of range: $r")
    }
  }

  test("length band keeps an interquartile-sized subset") {
    val kept = PipelineOps.queries("q81_length_band")(spark, sf)
      .collect().map(_.getAs[Long]("n_in_band")).sum.toDouble
    val total = Tables(spark, sf, "documents").count().toDouble
    // [p25, p75] holds ~50% of docs (ties can push it above)
    assert(kept / total >= 0.45 && kept / total <= 0.75,
      s"IQR band kept unexpected fraction: ${kept / total}")
  }

  test("decontamination flags only training docs, never the benchmark slice") {
    val rows = PipelineOps.queries("q82_decontaminate")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 50 != 0, "benchmark docs must not be flagged")
      assert(r.getAs[Long]("n_shared_grams") >= 1)
    }
  }

  test("lexical diversity: hapax ≤ vocab ≤ tokens and ttr consistent") {
    val rows = PipelineOps.queries("q83_lexical_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v, h) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"), r.getAs[Long]("hapax"))
      assert(h <= v && v <= n)
      assert(math.abs(r.getAs[Double]("ttr") - v.toDouble / n) < 1e-4)
    }
  }

  test("upsert conserves base keys and adds exactly the insert set") {
    val rows = Statistics.queries("q84_upsert")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    val base = Tables(spark, sf, "customer").count()
    val inserts = Tables(spark, sf, "customer")
      .filter(col("c_custkey") % 100 === 0).count()
    assert(total == base + inserts, "merged row count = base + inserted keys")
  }

  test("funnel users each have the subsequence in event-time order") {
    val flagged = Statistics.queries("q85_funnel")(spark, sf).collect()
      .map(_.getAs[Long]("user_id")).toSet
    assert(flagged.nonEmpty)
    // recompute independently from raw events
    val byUser = Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .groupBy(_.getLong(0))
    val expected = byUser.filter { case (_, rs) =>
      val types = rs.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2))).map(_.getString(3))
      val i = types.indexOf("signup")
      val j = if (i < 0) -1 else types.indexOf("click", i + 1)
      i >= 0 && j >= 0 && types.indexOf("purchase", j + 1) >= 0
    }.keySet
    assert(flagged == expected)
  }

  test("semdedup within-cell pairs are a subset of the brute-force ground truth") {
    val cells = llm.Similarity.queries("q86_semdedup")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = ops.Extended.queries("q51_embed_neardup")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cells.nonEmpty)
    assert(cells.subsetOf(truth),
      s"cell-local pairs not in ground truth: ${cells.diff(truth).take(5)}")
  }

  test("keep-first dedup conserves totals and keeps one row per distinct content key") {
    val rows = PipelineOps.queries("q87_dedup_keep_first")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") == r.getAs[Long]("n_total"))
    }
    val kept = rows.map(_.getAs[Long]("n_kept")).sum
    val distinctKeys = Tables(spark, sf, "events")
      .select("user_id", "event_type", "value").distinct().count()
    assert(kept == distinctKeys)
  }

  test("explode_outer preserves every document, null row iff no long token") {
    val out = Statistics.queries("q88_explode_outer")(spark, sf)
    val total = Tables(spark, sf, "documents").count()
    assert(out.select("doc_id").distinct().count() == total)
    val nullDocs = out.filter(col("long_tok").isNull).count()
    assert(nullDocs > 0, "fixture should contain docs with no 8-char token")
  }

  test("unpivot(pivot(x)) equals the plain group-by") {
    val rows = Statistics.queries("q89_unpivot")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables(spark, sf, "orders").count())
  }

  test("dedup clusters: every near-dup pair lands in one component, canonical = min member") {
    val labels = llm.TextDedup.queries("q93_dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    val pairs = llm.TextDedup.queries("q35_dedup_minhash")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid canonical is not the min member")
    }
  }

  test("chunk dedup finds only cross-doc chunks, each occurring at least twice") {
    val rows = PipelineOps.queries("q76_chunk_dedup")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2)
      assert(r.getAs[Long]("n_occurrences") >= r.getAs[Long]("n_docs"))
    }
  }
}
