package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables, r6, r6n}

/** Round-9 sketch operators with ACCURACY AUDITS: a Count-Min
  * frequency sketch, a KMV (bottom-k) set-overlap sketch, and PMI
  * co-occurrence over a capped vocabulary. The sketches use sha-256
  * hex-derived hashes (engine-portable — the DuckDB oracles rebuild
  * the identical buckets via a hex fold), so the ENTIRE sketch
  * pipeline is oracle-checked, not just its shape; each query also
  * emits the exact value next to the estimate, making sketch error a
  * first-class, regression-guarded output.
  */
object Sketches {

  private val CmsD = 4 // Count-Min rows
  private val CmsW = 256 // Count-Min buckets per row
  private val KmvK = 128 // bottom-k sketch size

  /** Bucket for CMS row `i`: 4 hex chars of the token's sha-256 at
    * offset 4i → integer (Spark conv; the oracle's strpos fold), mod
    * the row width. One sha-256 per DISTINCT token feeds all rows. */
  private def cmsBucket(tok: Column, i: Int): Column =
    pmod(conv(substring(sha2(tok, 256), 1 + 4 * i, 4), 16, 10).cast("long"),
      lit(CmsW.toLong))

  /** First-15-hex sha fold to BIGINT — the q36 engine-portable hash. */
  private def sha15(tok: Column): Column =
    conv(substring(sha2(tok, 256), 1, 15), 16, 10).cast("long")

  private def tokens(s: SparkSession, dir: String) =
    Tables(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

  val queries: Map[String, Q] = Map(

    /** Count-Min sketch with its error bill: a d×w = 4×256 counter
      * grid over the token stream (the bounded-state frequency
      * structure a 100 TB pipeline keeps where an exact token count
      * table cannot fit hot storage), then the top-20 TRUE tokens'
      * estimates read back from the grid next to their exact counts.
      * CMS guarantees est ≥ true (overest is collision mass, never
      * undercount) — emitted per token, so a hash-family or merge bug
      * that breaks the one-sided bound goes red in the oracle, and
      * the audit ITSELF is the sketch-sizing read (overest/true says
      * whether w = 256 suffices for this vocabulary). Build cost: one
      * token-count combine + a 1024-row grid aggregate; per-token
      * work is one sha-256 on the DISTINCT token table. */
    "q293_countmin_audit" -> ((s: SparkSession, dir: String) => {
      val counts = tokens(s, dir).groupBy(col("tok"))
        .agg(count(lit(1)).as("c")).cache()
      val grid = counts.select(col("c"), explode(array((0 until CmsD).map(i =>
          struct(lit(i).as("i"), cmsBucket(col("tok"), i).as("b"))): _*)).as("ib"))
        .groupBy(col("ib.i").as("i"), col("ib.b").as("b"))
        .agg(sum(col("c")).as("cell"))
      val top = counts.orderBy(desc("c"), asc("tok")).limit(20)
      val probes = top.select(col("tok"), col("c"),
          explode(array((0 until CmsD).map(i =>
            struct(lit(i).as("i"), cmsBucket(col("tok"), i).as("b"))): _*)).as("ib"))
        .select(col("tok"), col("c"), col("ib.i").as("i"), col("ib.b").as("b"))
      probes.join(grid, Seq("i", "b"))
        .groupBy(col("tok"))
        .agg(max(col("c")).as("true_count"), min(col("cell")).as("est_count"))
        .select(col("tok").as("token"), col("true_count"), col("est_count"),
          (col("est_count") - col("true_count")).as("overest"))
        .orderBy(desc("true_count"), asc("token"))
    }),

    /** KMV (bottom-k) distinct-set sketches per source + the overlap
      * estimates they give, audited against exact Jaccard: each
      * source's distinct-token set compresses to its k = 128 smallest
      * sha-derived hashes; for a source pair, the bottom-k of the
      * MERGED sketch is a uniform sample of the union, and the share
      * of sampled hashes present in both sketches estimates Jaccard
      * (any union-bottom-k hash that belongs to a set is necessarily
      * in that set's own bottom-k, so sketch-only data suffices). The
      * 100 TB story: source-pair overlap from 20 sketches of 128
      * longs instead of a token-level self-join; the audit column is
      * the decision whether that trade is safe. Estimates are
      * /128-dyadic rationals — NUDGED rounding on both engines (a
      * 7th decimal digit of 5 is structural for denominator 128). */
    "q294_kmv_source_overlap" -> ((s: SparkSession, dir: String) => {
      val st = tokens(s, dir).select(col("source"), col("tok")).distinct()
        .select(col("source"), sha15(col("tok")).as("h"))
        .cache()
      val wSrc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("h"))
      val tops = st.withColumn("rn", row_number().over(wSrc))
        .filter(col("rn") <= KmvK).drop("rn").cache()
      val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
      // union of the two sketches per unordered pair, both-membership
      // counted, ranked within the pair, bottom-k kept
      val pairsAll = tops.as("x")
        .join(sizes.select(col("source").as("s2")), col("x.source") < col("s2"))
        .select(col("x.source").as("s1"), col("s2"), col("h"), lit(1L).as("m"))
        .union(tops.as("x")
          .join(sizes.select(col("source").as("s1")), col("s1") < col("x.source"))
          .select(col("s1"), col("x.source").as("s2"), col("h"), lit(1L).as("m")))
      val merged = pairsAll
        .groupBy(col("s1"), col("s2"), col("h"))
        .agg(count(lit(1)).as("m"))
      val wPair = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s1"), col("s2")).orderBy(col("h"))
      val est = merged.withColumn("rn", row_number().over(wPair))
        .filter(col("rn") <= KmvK)
        .groupBy(col("s1"), col("s2"))
        .agg(count_if(col("m") === 2L).as("est_hits"),
          count(lit(1)).as("union_k"))
      // exact Jaccard over the full distinct-token sets
      val exact = st.as("a").join(st.as("b").hint("shuffle_hash"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("source").as("s1"), col("n").as("n1")), "s1")
        .join(sizes.select(col("source").as("s2"), col("n").as("n2")), "s2")
        .select(col("s1"), col("s2"),
          (col("inter") / (col("n1") + col("n2") - col("inter"))).as("exact_jac"))
      est.join(exact, Seq("s1", "s2"))
        .select(col("s1").as("source_a"), col("s2").as("source_b"),
          col("est_hits"), col("union_k"),
          r6n(col("est_hits").cast("double") / col("union_k")).as("est_jaccard"),
          r6n(col("exact_jac")).as("exact_jaccard"),
          r6n(abs(col("est_hits").cast("double") / col("union_k") -
            col("exact_jac"))).as("abs_err"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    /** Zipf rank-frequency fit over the head-1000 vocabulary — the
      * distributional companion to the Heaps'-law growth fit: a
      * log-log OLS of frequency on rank estimates the Zipf exponent
      * (natural text ≈ 1; a flat head means templated/synthetic text,
      * a steep head a degenerate vocabulary), and r² says whether the
      * power law holds at all. Ranking the 1000-row head uses a
      * non-foldable-key window (bounded input — the q101 stance,
      * never a corpus-wide funnel); the fit is one regr_* codegen
      * fold, identical in both engines. */
    "q307_zipf_fit" -> ((s: SparkSession, dir: String) => {
      val counts = tokens(s, dir).groupBy(col("tok"))
        .agg(count(lit(1)).as("c"))
      val top = counts.orderBy(desc("c"), asc("tok")).limit(1000)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(length(col("tok")), lit(1)))
        .orderBy(desc("c"), asc("tok"))
      val ranked = top.withColumn("r", row_number().over(w))
        .select(log(col("r").cast("double")).as("lr"),
          log(col("c").cast("double")).as("lc"))
      ranked.agg(count(lit(1)).as("n_tokens"),
          expr("regr_slope(lc, lr)").as("sl"),
          expr("regr_intercept(lc, lr)").as("ic"),
          expr("regr_r2(lc, lr)").as("r2"))
        .select(col("n_tokens"), r6(-col("sl")).as("zipf_exponent"),
          r6(col("ic")).as("intercept"), r6(col("r2")).as("r_squared"))
    }),

    /** Per-source Zipf exponents — q307 localized: WHICH crawls are
      * templated? Each source's head-200 rank-frequency fit in one
      * grouped pass; the per-source rank windows partition on the
      * source key with a WindowGroupLimit rank cut (the q209 head-set
      * stance — source cardinality is a domain property, not a
      * volume), and all 20 fits fold as grouped regr_* aggregates.
      * A flat exponent or low r² singles out machine-generated
      * sources before any dedup pass sees them. */
    "q317_source_zipf" -> ((s: SparkSession, dir: String) => {
      val counts = tokens(s, dir).groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(desc("c"), asc("tok"))
      counts.withColumn("r", row_number().over(w))
        .filter(col("r") <= 200)
        .select(col("source"), log(col("r").cast("double")).as("lr"),
          log(col("c").cast("double")).as("lc"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          r6(-expr("regr_slope(lc, lr)")).as("zipf_exponent"),
          r6(expr("regr_r2(lc, lr)")).as("r_squared"))
        .orderBy(col("source"))
    }),

    /** Precision-recall threshold sweep for the stopword-ratio
      * English detector — the OPERATING-CURVE view q148's single-point
      * kappa cannot give: five candidate thresholds, each with its
      * confusion counts and P/R/F1, so the curator picks the knee
      * instead of inheriting q41's hardcoded 0.04. One scan; the
      * (doc × threshold) explode is a 5× literal generator; the ratio
      * compare is the same exact integer-division double in both
      * engines (the q41 precedent). Integer confusion counts; P/R/F1
      * nudged integer rationals. */
    "q308_threshold_sweep" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select((col("lang") === "en").as("is_en"),
          (size(expr("filter(split(text, ' '), t -> t IN ('the', 'a'))"))
            .cast("double") /
            size(split(col("text"), " ")).cast("double")).as("sr"))
      d.select(col("is_en"), col("sr"),
          explode(expr("array(0.02D, 0.04D, 0.06D, 0.08D, 0.10D)")).as("t"))
        .groupBy(col("t"))
        .agg(count_if(col("sr") >= col("t") && col("is_en")).as("tp"),
          count_if(col("sr") >= col("t") && !col("is_en")).as("fp"),
          count_if(col("sr") < col("t") && col("is_en")).as("fn"),
          count_if(col("sr") < col("t") && !col("is_en")).as("tn"))
        .select(col("t").as("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
          // nullif guards: an empty predicted-positive set at the
          // strictest threshold must yield NULL, not a zero-division
          r6n(col("tp").cast("double") /
            nullif((col("tp") + col("fp")).cast("double"), lit(0.0)))
            .as("precision"),
          r6n(col("tp").cast("double") /
            nullif((col("tp") + col("fn")).cast("double"), lit(0.0)))
            .as("recall"),
          r6n(lit(2.0) * col("tp") /
            nullif(lit(2.0) * col("tp") + col("fp") + col("fn"), lit(0.0)))
            .as("f1"))
        .orderBy(col("threshold"))
    }),

    /** PMI token co-occurrence over the top-200 vocabulary — the
      * collocation/phrase-mining primitive behind tokenizer-merge and
      * stop-phrase decisions: PMI = ln(N·c₁₂/(c₁·c₂)) scores how much
      * more often two tokens share a document than independence
      * predicts. The pair universe is CAPPED to the head vocabulary
      * (the df-cap stance applied to co-occurrence: an uncapped
      * token-pair grid is quadratic in vocabulary), pairs come from a
      * doc-keyed self-join of the vocab-restricted postings, and the
      * corpus size N is one driver-side count (control-plane scalar,
      * the centroid-literal stance). Top-20 by r6-ROUNDED PMI with
      * token tiebreaks — the cross-engine float-ranking rule. */
    "q295_pmi_cooccurrence" -> ((s: SparkSession, dir: String) => {
      val dt = tokens(s, dir).select(col("doc_id"), col("tok")).distinct().cache()
      val dfc = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val vocab = dfc.orderBy(desc("df"), asc("tok")).limit(200).cache()
      val nDocs = dt.select(col("doc_id")).distinct().count()
      val vd = dt.join(broadcast(vocab), "tok")
      val pairs = vd.as("a")
        .join(vd.as("b").hint("shuffle_hash"),
          col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
        .groupBy(col("a.tok").as("t1"), col("b.tok").as("t2"))
        .agg(count(lit(1)).as("c12"))
        .filter(col("c12") >= 3)
      val pmi = log(lit(nDocs.toDouble) * col("c12").cast("double") /
        (col("df1").cast("double") * col("df2").cast("double")))
      pairs
        .join(broadcast(vocab.select(col("tok").as("t1"), col("df").as("df1"))), "t1")
        .join(broadcast(vocab.select(col("tok").as("t2"), col("df").as("df2"))), "t2")
        .select(col("t1"), col("t2"), col("c12"), col("df1"), col("df2"),
          r6(pmi).as("pmi"))
        .orderBy(desc("pmi"), asc("t1"), asc("t2"))
        .limit(20)
    })
  )

  /** 4-hex-char → integer fold for the oracle (DuckDB has no base
    * conversion; strpos over the hex alphabet is exact). */
  private def duckHex4(e: String): String = {
    def h(i: Int) = s"(strpos('0123456789abcdef', $e[$i]) - 1)"
    s"(((${h(1)} * 16 + ${h(2)}) * 16 + ${h(3)}) * 16 + ${h(4)})"
  }

  private def duckSha15(tok: String): String = {
    // 15 hex chars -> BIGINT via left fold, seeded BIGINT (q36 stance)
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(generate_series(1, 15),
       |    i -> CAST(strpos('0123456789abcdef', sha256($tok)[i]) - 1 AS BIGINT))),
       |  (a, x) -> a * 16 + x)""".stripMargin
  }

  private val duckTokens =
    """SELECT doc_id, source, t AS tok FROM (
      |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
      |  FROM documents WHERE text IS NOT NULL)
      |WHERE len(t) > 0""".stripMargin

  val oracles: Map[String, String] = Map(

    "q293_countmin_audit" -> {
      val bucket = (i: Int) =>
        s"(${duckHex4(s"substr(sha256(tok), ${1 + 4 * i}, 4)")} % $CmsW)"
      val rows = (0 until CmsD)
        .map(i => s"SELECT tok, c, $i AS i, ${bucket(i)} AS b FROM counts")
        .mkString("\nUNION ALL\n")
      s"""WITH toks AS ($duckTokens),
         |counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
         |hashed AS ($rows),
         |grid AS (SELECT i, b, CAST(sum(c) AS BIGINT) AS cell
         |  FROM hashed GROUP BY 1, 2),
         |top AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 20)
         |SELECT h.tok AS token, CAST(max(t.c) AS BIGINT) AS true_count,
         |CAST(min(g.cell) AS BIGINT) AS est_count,
         |CAST(min(g.cell) - max(t.c) AS BIGINT) AS overest
         |FROM hashed h
         |JOIN top t ON t.tok = h.tok
         |JOIN grid g ON g.i = h.i AND g.b = h.b
         |GROUP BY h.tok
         |ORDER BY true_count DESC, token NULLS FIRST""".stripMargin
    },

    "q294_kmv_source_overlap" -> {
      s"""WITH toks AS ($duckTokens),
         |st AS (
         |  SELECT source, ${duckSha15("tok")} AS h
         |  FROM (SELECT DISTINCT source, tok FROM toks)),
         |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY 1),
         |tops AS (
         |  SELECT source, h FROM (
         |    SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |    FROM st)
         |  WHERE rn <= $KmvK),
         |merged AS (
         |  SELECT s1, s2, h, count(*) AS m FROM (
         |    SELECT x.source AS s1, s.source AS s2, x.h AS h
         |    FROM tops x JOIN (SELECT DISTINCT source FROM st) s
         |      ON x.source < s.source
         |    UNION ALL
         |    SELECT s.source AS s1, x.source AS s2, x.h AS h
         |    FROM tops x JOIN (SELECT DISTINCT source FROM st) s
         |      ON s.source < x.source)
         |  GROUP BY 1, 2, 3),
         |est AS (
         |  SELECT s1, s2,
         |  CAST(count(*) FILTER (m = 2) AS BIGINT) AS est_hits,
         |  CAST(count(*) AS BIGINT) AS union_k
         |  FROM (
         |    SELECT s1, s2, h, m,
         |    row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn
         |    FROM merged)
         |  WHERE rn <= $KmvK
         |  GROUP BY 1, 2),
         |exact AS (
         |  SELECT a.source AS s1, b.source AS s2, count(*) AS inter
         |  FROM st a JOIN st b ON a.h = b.h AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT est.s1 AS source_a, est.s2 AS source_b, est_hits, union_k,
         |round(est_hits * 1.0 / union_k + 1e-12, 6) AS est_jaccard,
         |round(inter * 1.0 / (z1.n + z2.n - inter) + 1e-12, 6) AS exact_jaccard,
         |round(abs(est_hits * 1.0 / union_k
         |  - inter * 1.0 / (z1.n + z2.n - inter)) + 1e-12, 6) AS abs_err
         |FROM est
         |JOIN exact ON exact.s1 = est.s1 AND exact.s2 = est.s2
         |JOIN sizes z1 ON z1.source = est.s1
         |JOIN sizes z2 ON z2.source = est.s2
         |ORDER BY source_a NULLS FIRST, source_b NULLS FIRST""".stripMargin
    },

    "q307_zipf_fit" ->
      s"""WITH toks AS ($duckTokens),
         |counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
         |top AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 1000),
         |ranked AS (
         |  SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, tok) AS DOUBLE))
         |    AS lr,
         |  ln(CAST(c AS DOUBLE)) AS lc
         |  FROM top)
         |SELECT CAST(count(*) AS BIGINT) AS n_tokens,
         |round(-regr_slope(lc, lr), 6) AS zipf_exponent,
         |round(regr_intercept(lc, lr), 6) AS intercept,
         |round(regr_r2(lc, lr), 6) AS r_squared
         |FROM ranked""".stripMargin,

    "q317_source_zipf" ->
      s"""WITH toks AS ($duckTokens),
         |counts AS (
         |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM toks GROUP BY 1, 2),
         |ranked AS (
         |  SELECT source, ln(CAST(r AS DOUBLE)) AS lr, ln(CAST(c AS DOUBLE)) AS lc
         |  FROM (
         |    SELECT source, c,
         |    row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS r
         |    FROM counts)
         |  WHERE r <= 200)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         |round(-regr_slope(lc, lr), 6) AS zipf_exponent,
         |round(regr_r2(lc, lr), 6) AS r_squared
         |FROM ranked GROUP BY 1
         |ORDER BY source NULLS FIRST""".stripMargin,

    "q308_threshold_sweep" ->
      """WITH d AS (
        |  SELECT lang = 'en' AS is_en,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) * 1.0
        |    / len(string_split(text, ' ')) AS sr
        |  FROM documents WHERE text IS NOT NULL),
        |e AS (SELECT is_en, sr, unnest([0.02, 0.04, 0.06, 0.08, 0.10]) AS t FROM d)
        |SELECT CAST(t AS DOUBLE) AS threshold,
        |CAST(count(*) FILTER (sr >= t AND is_en) AS BIGINT) AS tp,
        |CAST(count(*) FILTER (sr >= t AND NOT is_en) AS BIGINT) AS fp,
        |CAST(count(*) FILTER (sr < t AND is_en) AS BIGINT) AS fn,
        |CAST(count(*) FILTER (sr < t AND NOT is_en) AS BIGINT) AS tn,
        |round(count(*) FILTER (sr >= t AND is_en) * 1.0
        |  / nullif(count(*) FILTER (sr >= t), 0) + 1e-12, 6) AS precision,
        |round(count(*) FILTER (sr >= t AND is_en) * 1.0
        |  / nullif(count(*) FILTER (is_en), 0) + 1e-12, 6) AS recall,
        |round(2.0 * count(*) FILTER (sr >= t AND is_en)
        |  / nullif(2.0 * count(*) FILTER (sr >= t AND is_en)
        |    + count(*) FILTER (sr >= t AND NOT is_en)
        |    + count(*) FILTER (sr < t AND is_en), 0) + 1e-12, 6) AS f1
        |FROM e GROUP BY 1
        |ORDER BY threshold NULLS FIRST""".stripMargin,

    "q295_pmi_cooccurrence" ->
      s"""WITH toks AS ($duckTokens),
         |dt AS (SELECT DISTINCT doc_id, tok FROM toks),
         |dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         |vocab AS (SELECT tok, df FROM dfc ORDER BY df DESC, tok LIMIT 200),
         |nd AS (SELECT count(DISTINCT doc_id) AS n FROM dt),
         |vd AS (SELECT dt.doc_id, dt.tok FROM dt JOIN vocab USING (tok)),
         |pairs AS (
         |  SELECT a.tok AS t1, b.tok AS t2, CAST(count(*) AS BIGINT) AS c12
         |  FROM vd a JOIN vd b ON a.doc_id = b.doc_id AND a.tok < b.tok
         |  GROUP BY 1, 2
         |  HAVING count(*) >= 3)
         |SELECT t1, t2, c12, v1.df AS df1, v2.df AS df2,
         |round(ln(nd.n * 1.0 * c12 / (v1.df * 1.0 * v2.df)), 6) AS pmi
         |FROM pairs
         |JOIN vocab v1 ON v1.tok = t1
         |JOIN vocab v2 ON v2.tok = t2
         |CROSS JOIN nd
         |ORDER BY pmi DESC NULLS LAST, t1 NULLS FIRST, t2 NULLS FIRST
         |LIMIT 20""".stripMargin
  )
}
