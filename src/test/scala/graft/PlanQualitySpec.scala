package graft

/** Regression guards for the physical-plan properties the engine's
  * 100 TB story depends on: pushdown, pruning, broadcast choice, and
  * top-k planning. A code change that silently loses one of these
  * would still be "correct" — these specs make it loud. */
class PlanQualitySpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
  }

  test("q02: scan reads only the projected columns") {
    val p = plan("q02_filter_pushdown")
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_partkey") && !read.contains("l_returnflag"),
      s"scan reads more than it needs: $read")
  }

  test("q04: star join broadcasts the dims and pushes the region filter") {
    val p = plan("q04_join_revenue_by_nation")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2)
    assert(p.contains("EqualTo(r_name,ASIA)"))
  }

  test("q15: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q15_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q05/q06: semi and anti joins plan as such") {
    assert(plan("q05_semi_join").contains("LeftSemi"))
    assert(plan("q06_anti_join").contains("LeftAnti"))
  }

  test("q92: rank filter pushes a WindowGroupLimit below the window sort") {
    val p = plan("q92_topk_per_group")
    assert(p.contains("WindowGroupLimit"),
      s"rn <= k should plan a per-group limit, got:\n$p")
  }

  test("q67: global ranking is range-partitioned, never a single-partition window") {
    val p = plan("q67_ntile_ranks")
    assert(p.toLowerCase.contains("rangepartitioning"),
      "global rank must range-partition by the sort key")
    // every Window operator must carry a partition spec (pid)
    p.linesIterator.filter(_.trim.startsWith("Window")).foreach { l =>
      assert(l.contains("pid"), s"unpartitioned window in plan line: $l")
    }
  }

  test("q82: benchmark gram side stays small (filter precedes the explode)") {
    val p = plan("q82_decontaminate")
    // the eval-slice predicate must appear as a scan-level pushed
    // filter, not a post-explode filter
    assert(p.linesIterator.count(_.contains("BroadcastExchange")) >= 1)
    assert(p.contains("PushedFilters"))
  }

  test("q113: 3-table analytic join pushes both date filters and plans top-k") {
    val p = plan("q113_ship_priority")
    assert(p.contains("TakeOrderedAndProject"), "top 10 must never be a global sort")
    assert(p.contains("GreaterThan(l_shipdate") && p.contains("LessThan(o_orderdate"),
      s"both dimension filters must reach the scans:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("HashJoin") || l.contains("SortMergeJoin")) >= 2)
  }

  test("q141: Q10 shape pushes both filters and plans top-k") {
    val p = plan("q141_returned_items")
    assert(p.contains("TakeOrderedAndProject"), "top 20 must never be a global sort")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter must reach the lineitem scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"date window must reach the orders scan:\n$p")
  }

  test("q51: exact all-pairs runs as a block equi-join, not a cartesian") {
    val p = plan("q51_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q51 must triangle-block-pair into an equi-join, got:\n$p")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"))
  }

  // Every nested-loop join left in the suite must have a PROVABLY
  // bounded build side — a 1-row aggregate (q30 profile pair, q53 IDF
  // denominator, q81/quantile bounds), a limit-k query block (q42/q43
  // top-k probes), driver-bounded centroids (q57 k=16; q122 kmeans
  // k=8 per iteration), a schema-bounded dim (q70: region x nation,
  // 5x25 independent of sf), or a per-cell block (q86, cell
  // cardinality capped by the LSH bucketing). Anything NEW showing up
  // here is a scale regression: either rewrite it (q51 pattern) or
  // justify + extend the list.
  private val boundedBnlj = Set(
    "q30_drift_compare", "q42_cosine_topk", "q43_knn_join", "q53_tfidf",
    "q57_ann_ivf", "q70_cross_join", "q81_length_band", "q86_semdedup",
    "q122_kmeans",
    // q133: the broadcast side is the ONE-ROW corpus-stats fold
    // (N, avgdl, per-term df) — provably 1 row regardless of sf
    "q133_bm25",
    // q136: the broadcast side is the ONE-ROW (n1, n2) totals fold
    "q136_ks_test",
    // q137: the broadcast side is the ONE-ROW vocab-size fold
    // (V = countDistinct over model-table-sized input) — provably
    // 1 row at any sf; it meets the model table, not the bigram stream
    "q137_bigram_ppl",
    // q157: the broadcast side is the ONE-ROW positive-balance
    // average (TPC-H Q22's scalar subquery) — provably 1 row at any sf
    "q157_rich_inactive",
    // q172: the final combine joins the ONE-ROW degree-stats fold to
    // the ONE-ROW triangle count — both provably 1 row at any sf; the
    // graph joins themselves are hinted shuffle_hash equi-joins
    "q172_triangle_count",
    // q182: the broadcast side is the 20-anchor query block (q42/q43
    // class — limit-k anchors, driver-bounded at any sf)
    "q182_hard_negatives",
    // q193: the broadcast side is the ONE-ROW grand-total fold
    // (TPC-H Q11's scalar subquery) — provably 1 row at any sf
    "q193_important_parts",
    // q195: the broadcast side is the ONE-ROW max-revenue fold
    // (TPC-H Q15's view max) — provably 1 row at any sf
    "q195_top_supplier",
    // q205: the exact arm's broadcast side is the 20-anchor query
    // block (q42/q43 class — driver-bounded at any sf)
    "q205_ann_recall",
    // q231: the exact arm's broadcast side is the 3-row query-document
    // block (q42/q182 anchor class — bounded at any sf)
    "q231_chunk_retrieval",
    // q282: the q57 serve twin — the broadcast side is the ONE-ROW
    // query-vector block; centroids are driver literals read from the
    // k·d state table, members fetched by equi-join on cell id
    "q282_ivf_serve",
    // q318: the combine is a ONE-ROW stats fold crossed with a
    // ONE-ROW quantile-pick fold — both provably 1 row at any sf
    "q318_contract_proposal",
    // q294: the sketch pair-expansion joins the 20-source domain list
    // (data-independent, the q240 lang-domain class) to the k=128
    // sketch rows — ≤ sources·k rows regardless of corpus volume
    "q294_kmv_source_overlap",
    // q216: the broadcast sides are the ONE-ROW censoring-time,
    // total-count, and max-death-hour folds — provably 1 row each
    "q216_km_survival",
    // q225: the broadcast side is the ONE-ROW total-revenue fold
    "q225_basket_economics",
    // q241: the broadcast side is the ONE-ROW customer-count fold
    // feeding the integer quintile bucket formula — provably 1 row
    "q241_rfm_segments",
    // q234: the broadcast side is the ONE-ROW (N, tie-sum) totals
    // fold over the distinct-value table — provably 1 row at any sf
    "q234_kruskal_wallis",
    // q236: the broadcast sides are the ONE-ROW domain-bounds fold
    // and the ONE-ROW row/column tie folds — provably 1 row each;
    // the contingency explode itself is an equi-keyed join
    "q236_kendall_tau",
    // q240: the pair grid is the lang-domain cross (≤ langs² rows,
    // data-independent — the language set does not grow with corpus
    // volume); profile joins are equi-keyed
    "q240_chargram_profile",
    // q223: the broadcast side is the ONE-ROW (d0, d1) span fold —
    // provably 1 row at any sf
    "q223_stickiness",
    // q227: the broadcast side is the ONE-ROW span-cutoff fold
    "q227_new_parts",
    // q255: the broadcast side is the ONE-ROW corpus doc-count fold
    // (q53's IDF denominator, same class) — provably 1 row at any sf
    "q255_doc_keywords",
    // q277: the broadcast side is the ONE-ROW totals fold (corpus
    // count + per-source counts — q136 class), provably 1 row
    "q277_source_ks_profile",
    // q272: the broadcast side is the ONE-ROW match-rate fold
    // (q30 class) — provably 1 row at any sf
    "q272_feature_staleness",
    // q269/q270: the broadcast side is the ONE-ROW span fold
    // (q223 class) — provably 1 row at any sf
    "q269_prop_ztest", "q270_churn_by_decile",
    // q266: the broadcast side is the 20-anchor query block
    // (q205's exact arm, q42/q43 class — driver-bounded at any sf)
    "q266_ndcg_audit",
    // q264: the broadcast sides are the ONE-ROW BM25 corpus-stats
    // fold (q133 class) and the ONE-ROW query-vector block (q42/q57
    // class) — provably 1 row each at any sf
    "q264_rrf_fusion",
    // q338: the final combine crosses the ONE-ROW src0 stats fold
    // with the ONE-ROW src1 stats fold — both provably 1 row
    "q338_yuen_trimmed",
    // q344: the dominance theta-join is over the per-SOURCE metrics
    // table — schema-bounded domain (~20 rows at any corpus size,
    // the q70 dim-cross class)
    "q344_source_skyline",
    // q341: the broadcast side is the 100-row probe block (50 sha-
    // picked real + 50 synthetic — constant at any corpus size, the
    // q42/q43 anchor class)
    "q341_hopkins",
    // q340: the broadcast side is the ONE-ROW (Nt, Nr) token-totals
    // fold crossed into the 1024-row bucket model table (q133/q136
    // class) — provably 1 row at any corpus size
    "q340_dsir_weights",
    // q345: the final combine crosses the ONE-ROW group-a feature
    // means with the ONE-ROW group-b means (q338 class)
    "q345_mmd_embedding",
    // q346: the broadcast side is the ONE-ROW (N_a, N_b) totals fold
    // (q136 KS class) — provably 1 row at any corpus size
    "q346_wasserstein_lengths",
    // q348: the broadcast side is the ONE-ROW pooled-slope fold
    // (q136 class) — provably 1 row at any corpus size
    "q348_simpson_audit",
    // q351: the broadcast sides are the ONE-ROW (μ, σ) score fold
    // (q136 class) and the ONE-ROW ECE fold over the ≤10-row bin
    // table — provably 1 row each at any corpus size
    "q351_ece_calibration",
    // q354: the broadcast side is the ONE-ROW cross-split edge
    // contract fold (q136 class) — provably 1 row at any corpus size
    "q354_leakage_safe_split",
    // q355: the broadcast side is the ONE-ROW (μ, σ) score fold
    // (q351/q136 class) — provably 1 row at any corpus size
    "q355_isotonic_calibration",
    // q360: the broadcast sides are the ONE-ROW query vector and the
    // ≤5-row picked block crossed with the 20-row candidate block —
    // all driver-bounded at any corpus size (q42/q182 anchor class)
    "q360_mmr_rerank",
    // q321 (round-11 form): the final combine crosses the ONE-ROW
    // delta-log metrics fold with the ONE-ROW compare-join fold
    // before the 5-row stack unpivot — both provably 1 row
    "q321_pair_store_compact",
    // q421 (round-16): the same shape as q321 — the ONE-ROW log
    // metrics fold crossed with the ONE-ROW maintained-vs-rebuilt
    // fold before the 5-row stack unpivot (replacing two .head
    // driver round-trips with one plan)
    "q421_dup_run_store_compact",
    // q361: the broadcast side is the ONE-ROW corpus-chars total
    // (q136 class) — provably 1 row at any corpus size
    "q361_dedup_threshold_curve",
    // q362: the broadcast sides are the ONE-ROW query-vector block
    // (q282 class) and the k=8-row cell-rank table (q122 control-
    // plane class) — both driver-bounded at any corpus size
    "q362_ivf_nprobe_curve",
    // q365: the prefix theta-join is over the per-SOURCE totals table
    // (schema-bounded domain, ~20 rows at any corpus size — the
    // q344 dim-cross class)
    "q365_quota_select",
    // q366: the broadcast side is the ONE-ROW corpus pre/post totals
    // fold (q361/q136 class) — provably 1 row at any corpus size
    "q366_dedup_mix_shift",
    // q368: the broadcast sides are the per-SOURCE stats grid
    // (schema-bounded, q344 class) and the ONE-ROW vocab-size and
    // train-doc-count folds (q136 class) — all bounded at any
    // corpus size
    "q368_source_classifier",
    // q369: the prefix theta-join is over the per-SOURCE counts table
    // (schema-bounded domain — the q365/q344 dim-cross class)
    "q369_boundary_stitch",
    // q371: the prefix theta-join is over the per-SOURCE totals table
    // (q365 class — schema-bounded domain at any corpus size)
    "q371_budget_fill_curve",
    // q376: the broadcast side is the ONE-ROW corpus max-id fold
    // (q136 class) — provably 1 row at any corpus size
    "q376_vocab_growth_curve",
    // q378/q379: the broadcast side is the ONE-ROW time-span midpoint
    // fold (q136 class) — provably 1 row at any corpus size
    "q378_cuped", "q379_diff_in_diff",
    // q384/q386: the broadcast sides are the ONE-ROW span fold and
    // the ONE-ROW totals fold (q136 class) — provably 1 row each
    "q384_capture_recapture", "q386_jackknife_sources",
    // q390: the broadcast side is the ONE-ROW corpus max-id fold
    // (q136/q376 class) — provably 1 row at any corpus size
    "q390_dup_decile_trend",
    // q391: the prefix theta-join is over the per-SOURCE counts table
    // (schema-bounded domain — the q365/q369 dim-cross class)
    "q391_sample_audit",
    // q392: the RBO pair grid is the SOURCE x SOURCE domain cross
    // (schema-bounded, q344 class — ~20x20 at any corpus size, each
    // side carrying one 50-token array)
    "q392_vocab_rbo",
    // q394: the broadcast side is the ONE-ROW corpus mean-norm fold
    // (q136 class) — provably 1 row at any corpus size
    "q394_norm_census",
    // q395: the broadcast sides are the ONE-ROW doc total and the two
    // ONE-ROW entropy folds (q136 class); the cell/marginal joins are
    // equi-joins over the schema-bounded (source, lang) grid
    "q395_source_lang_mi",
    // q396: the broadcast sides are the ONE-ROW max-id fold and the
    // ONE-ROW half-totals fold (q136 class)
    "q396_token_drift",
    // q401: each edge combines its ONE-ROW child-count fold with its
    // ONE-ROW orphan-count fold (the q172 1-row x 1-row class); the
    // orphan anti-joins themselves are equi-joins
    "q401_fk_orphans",
    // q402: the broadcast side is the ONE-ROW corpus total fold
    // (q136 class); the rank adjacency itself is an equi-join on rn
    "q402_shuffle_mixing_audit",
    // q403: the broadcast side is the 3-ROW probe query block (the
    // q42/q231 bounded anchor class) — the corpus scans once against
    // it, never corpus x corpus
    "q403_dot_cosine_rank_bias",
    // q406: the broadcast side is the 4-ROW threshold grid (a literal
    // domain, data-independent); the victim/band joins are equi-joins
    "q406_dedup_threshold_regret",
    // q407: the broadcast side is the ONE-ROW pair-total fold
    // (q136 class)
    "q407_dup_distance_profile",
    // q408/q409: the broadcast sides are the ONE-ROW bigram-total and
    // token-total folds (the q133/q137 corpus-stats class)
    "q408_llr_collocations", "q409_interpolated_ppl",
    // q416: the broadcast side is the ONE-ROW corpus-token fold
    // (q136 class)
    "q416_dup_run_planner")

  // ONE physical-plan sweep shared by every suite-wide guard below —
  // building 150 plans is the dominant cost, don't pay it per test
  private lazy val allPlans: Map[String, org.apache.spark.sql.execution.SparkPlan] =
    SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
    }.toMap

  test("suite-wide: no unbounded cartesian/nested-loop plan in any registered query") {
    val offenders = allPlans.toSeq.sortBy(_._1).flatMap { case (name, p) =>
      val s = p.toString
      if (s.contains("BroadcastNestedLoopJoin") || s.contains("CartesianProduct"))
        Some(name)
      else None
    }
    val unexpected = offenders.filterNot(boundedBnlj)
    assert(unexpected.isEmpty,
      s"queries with a new nested-loop/cartesian plan: ${unexpected.mkString(", ")}")
  }

  // Columns whose distinct count is a property of the SCHEMA/DOMAIN
  // (a handful of segments, flags, priorities, types), not of data
  // volume. A full Window partitioned ONLY on these sorts each key's
  // entire history in one task no matter how many executors exist —
  // the low-cardinality window scale-killer (old q143/q68 shape).
  private val constCardinality = Set(
    "event_type", "c_mktsegment", "c_nationkey", "s_nationkey",
    "o_orderpriority", "o_orderstatus", "l_returnflag", "l_linestatus",
    "r_name", "n_name", "p_brand", "p_container", "p_type",
    "language", "severity", "status")

  // Windows whose INPUT row count is provably bounded independent of
  // data volume, so a constant-cardinality partition key is harmless:
  //   q120: prefix window over the per-(range-partition, group) totals
  //         table — ≤ tasks x groups rows by construction
  //   q101: vocab id assignment — row_number over the LIMIT-1000 top-k
  //         output, ≤ 1000 rows in one task at any corpus scale
  //   q264: rank assignment over each retrieval arm's LIMIT-20
  //         output — ≤ 20 rows in one task at any corpus scale
  private val boundedInputWindows =
    Set("q120_weighted_quantiles", "q101_vocab_encode", "q264_rrf_fusion")

  test("suite-wide: no full window partitioned only on constant-cardinality keys") {
    val offenders = allPlans.toSeq.sortBy(_._1).flatMap { case (name, p) =>
      val wins = WindowAudit.collectWindows(p)
      // a WindowGroupLimit with the same partition spec means the
      // planner capped every map task's contribution at k rows per
      // group BEFORE the window shuffle (q12/q92/q68 rank-filter
      // shape) — the window input is O(k x cluster width), fine
      val groupLimited = wins.collect { case ("WindowGroupLimit", s) => s }.toSet
      wins.collect {
        case ("Window", spec)
            if !groupLimited.contains(spec) && !boundedInputWindows(name) =>
          val refs = spec.flatMap(_.split("\\+")).filterNot(_.startsWith("<"))
          if (refs.isEmpty || refs.forall(constCardinality))
            Some(s"$name ${spec.mkString("[", ", ", "]")}")
          else None
      }.flatten
    }
    assert(offenders.isEmpty,
      "window partition specs whose cardinality cannot grow with data " +
        s"volume (tile-and-halo or rank-filter them): ${offenders.mkString("; ")}")
  }

  // Any double column a query emits is hash-compared bit-for-bit
  // against DuckDB, so its expression must be portable across two
  // independent engines (round-7's q202 red row was exactly this
  // class). FloatAudit classifies each: nudged rounds and pure
  // integer arithmetic are safe by construction; rounds over
  // volume-scale float folds / libm calls sit off the rounding grid
  // (RoundedFold — the measured stance, 7 rounds of green hashes);
  // anything else fails here until fixed or allowlisted WITH a
  // rationale, so the one-red-row-per-round pattern cannot recur.
  private val floatAllow = Map[String, String](
    "q266_ndcg_audit.dcg" ->
      ("round(sum(rel / log2(pos + 1)), 6) — rel and pos are INTEGER " +
        "rank derivatives; the classifier chases row_number's window " +
        "ORDER key (the rounded cosine) and misreads it as arithmetic " +
        "above a round; the grade values never touch the score round"),
    "q266_ndcg_audit.ndcg_at_10" ->
      ("same integer-rank lineage divided by a literal-sequence fold " +
        "(identical op order in both engines) then rounded — the only " +
        "rounds below are window ORDER keys, not value inputs"),
    "q264_rrf_fusion.rrf" ->
      ("the emitted value IS round(sum of 1/(60 + rank) + 1e-12, 6) — a " +
        "nudged round as the final step over INTEGER ranks; the " +
        "classifier chases row_number's window ORDER key (the arm's " +
        "rounded score) and misreads it as arithmetic above a round — " +
        "the rank is an integer, the score round never feeds the value"),
    "q257_bootstrap_ci.mean" ->
      ("the replica mean m IS round(swv/sw + 1e-12, 6) — a nudged round; " +
        "above it sit only SELECTION ops (max of the single b = -1 row), " +
        "which cannot move the value off the rounded grid"),
    "q257_bootstrap_ci.ci_lo" ->
      ("element_at(array_sort(collect_list(...)), k).m extracts one " +
        "already-nudged-rounded replica mean — pure selection above the " +
        "round, no arithmetic"),
    "q257_bootstrap_ci.ci_hi" ->
      ("same as ci_lo: order-statistic selection of a nudged-rounded " +
        "value; the sort key is the rounded value itself with replica " +
        "tie-break, so selection is engine-stable too"),
    "q292_brier_calibration.mean_score" ->
      ("avg over r6-GRID scores with a NUDGED round as the final step; " +
        "the inner round is the bin-semantics key (scores are binned on " +
        "their rounded value), so the mean's operand grid is identical " +
        "in both engines and the final r6n seals it"),
    "q296_knn_outlier.dk" ->
      ("order-statistic SELECTION (max of the rn<=5 rows) of r6-rounded " +
        "distances — the round defines the neighbor ranking key and the " +
        "max emits one grid value verbatim, no arithmetic above it"),
    "q296_knn_outlier.outlier_ratio" ->
      ("ratio of an r6-grid distance to its cell average of grid values " +
        "with a NUDGED round as the final step — the inner round is the " +
        "ranking key (selection), not a value perturbation"),
    "q233_cusum_shift.max_cusum" ->
      ("the emitted value IS round(fold.mx + 1e-12, 6) — a nudged round " +
        "as the final step; the classifier cannot project into the " +
        "aggregate-HOF struct and trips on the SIBLING field's inner " +
        "round (the alarm-threshold comparison, which is not emitted raw)"),
    "q394_norm_census.norm_min" ->
      ("order-statistic SELECTION (min) of r6-rounded norms — the " +
        "q296.dk / q389.cos_min stance: the round defines the grid and " +
        "min emits one grid value verbatim, no arithmetic above it"),
    "q394_norm_census.norm_max" ->
      ("order-statistic SELECTION (max) of r6-rounded norms — same " +
        "selection-above-a-round class"),
    "q394_norm_census.norm_mean" ->
      ("avg over r6-GRID norms with a NUDGED round as the final step — " +
        "the q292.mean_score / q389.cos_mean stance: the inner round is " +
        "the shared grid, the final r6n seals the mean"),
    "q389_srp_calibration.cos_min" ->
      ("order-statistic SELECTION (min) of r6-rounded cosines — the " +
        "q296.dk stance: the round defines the grid and min emits one " +
        "grid value verbatim, no arithmetic above it"),
    "q389_srp_calibration.cos_max" ->
      ("order-statistic SELECTION (max) of r6-rounded cosines — same " +
        "q296.dk selection-above-a-round class"),
    "q389_srp_calibration.cos_mean" ->
      ("avg over r6-GRID cosines with a NUDGED round as the final step " +
        "— the q292.mean_score stance: the inner round is the band " +
        "grid both engines share, so the mean's operand set is " +
        "identical and the final r6n seals it"),
    "q389_srp_calibration.ge03_share" ->
      ("ratio of two INTEGER counts with a NUDGED round as the final " +
        "step; the inner round sits inside the count_if COMPARISON " +
        "(cs6 >= 0.3) — the cross-engine ranking grid (the q292 " +
        "bin-key / q356.coverage stance), never a value input"),
    "q356_conformal_coverage.coverage" ->
      ("ratio of two INTEGER counts with a NUDGED round as the final " +
        "step; the inner rounds the classifier trips on sit inside the " +
        "count_if COMPARISON (st <= qhat) — they are the cross-engine " +
        "ranking grid (both residual and cutoff live on the identical " +
        "r6 grid, the q292 bin-key stance), never a value input"))

  test("suite-wide: every emitted double column is cross-engine portable") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      FloatAudit.audit(SparkEntry.queries(name)(spark, sf)).collect {
        case (c, u: FloatAudit.Unsafe) if !floatAllow.contains(s"$name.$c") =>
          s"$name.$c (${u.reason})"
      }
    }
    assert(offenders.isEmpty,
      "non-portable double outputs (nudge-then-round them, derive them " +
        s"from integer totals, or allowlist with rationale): ${offenders.mkString("; ")}")
  }
}
