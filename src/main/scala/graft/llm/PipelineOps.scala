package graft.llm

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables, r2, r4, r6, r2n, r4n, r6n}

/** End-to-end training-data curation operators a 100 TB pipeline needs
  * beyond raw dedup detection: applying a dedup keep-list, chunk-level
  * (paragraph) exact dedup, repetition-ratio quality scoring (Gopher
  * rule 9-12 style), deterministic content-hash sampling and
  * train/val/test splitting, per-cluster embedding centroid coherence,
  * and percentile-band length filtering.
  *
  * Determinism discipline: "random" sampling and splitting are keyed on
  * sha-256 of content / id — reproducible across engines AND across
  * cluster re-runs, the property a production pipeline needs so a
  * re-run never reshuffles the split (cf. the reference's deterministic
  * re-runs over fixed CSV fixtures, `pipeline_runner.py:74-76`).
  *
  * Scale notes per query in the Scaladoc below; none materializes on
  * the driver, none cross-joins raw documents.
  */
object PipelineOps {

  val queries: Map[String, Q] = Map(

    /** Apply near-dup dedup: greedy keep-list = every doc that never
      * appears as the higher-id member (d2) of a verified ≥0.8-Jaccard
      * pair. Per-language retention report. The drop-set is tiny
      * relative to the corpus (it's the duplicates), so the anti-join
      * broadcasts at scale. */
    "q75_dedup_apply" -> ((s: SparkSession, dir: String) => {
      val docs = Tables(s, dir, "documents")
      val drops = TextDedup.jaccardPairs(docs, 0.8)
        .select(col("d2").as("doc_id")).distinct()
      docs.join(broadcast(drops.withColumn("dropped", lit(1))), Seq("doc_id"), "left_outer")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          count(col("dropped")).as("n_dropped"),
          count_if(col("dropped").isNull).as("n_kept"))
        .orderBy(col("lang"))
    }),

    /** Chunk-level exact dedup: non-overlapping 10-token chunks hashed
      * with SHA-256; chunks appearing in ≥2 distinct docs are
      * boilerplate candidates (the paragraph-dedup primitive used on
      * web corpora). Shuffle key is the 32-byte hash, never the chunk
      * text. */
    "q76_chunk_dedup" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 10)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(toks) - 9, 10),
            |  i -> sha2(concat_ws(' ', slice(toks, i, 10)), 256))""".stripMargin)).as("h"))
        .groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") >= 2)
        .select(substring(col("h"), 1, 16).as("chunk_hash"),
          col("n_docs"), col("n_occurrences"))
        .orderBy(col("chunk_hash"))
    }),

    /** Repetition ratio (duplicate-3-gram fraction) per document — the
      * Gopher-style repetitiveness quality signal. Computed entirely
      * with per-row array expressions (no explode, no shuffle): the
      * distinct-shingle count comes from array_distinct over the
      * per-row shingle array. */
    "q77_rep_ratio" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"),
          (size(col("toks")) - 2).cast("long").as("n_shingles"),
          expr("""size(array_distinct(transform(
            |  sequence(1, size(toks) - 2),
            |  i -> concat_ws(' ', slice(toks, i, 3)))))""".stripMargin)
            .cast("long").as("n_distinct"))
        // + 1e-12: the ratio is a small-denominator rational that can
        // land exactly on a round-half tie (see q39 / SKILL.md)
        .select(col("doc_id"), col("n_shingles"), col("n_distinct"),
          round(lit(1.0) - col("n_distinct") / col("n_shingles") + lit(1e-12), 4)
            .as("rep_ratio"))
        .orderBy(desc("rep_ratio"), col("doc_id"))
        .limit(20)
    }),

    /** Deterministic 1/4 corpus sample keyed on sha-256(text): first
      * hex digit < '4'. Reproducible on any engine / cluster size —
      * no RNG, no seed-ordering hazard; the idiom that replaces
      * df.sample() when lineage reproducibility matters. */
    "q78_hash_sample" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .filter(substring(sha2(col("text"), 256), 1, 1) < "4")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"), r2n(avg(col("n_chars"))).as("avg_chars"))
        .orderBy(col("lang"))
    }),

    /** WEIGHTED sample without replacement (Efraimidis–Spirakis
      * A-Res): per doc a uniform u ∈ (0,1) derives from the sha-256 of
      * its id (60-bit hex prefix — deterministic, engine-portable, the
      * q78/q79 stance on "randomness"), the sample key is ln(u)/w with
      * w = n_chars (the log-domain form of u^(1/w): same ordering,
      * without u^(1/500)-style clustering at 1.0), and the sample is
      * the top-k keys — longer documents draw proportionally more
      * often, the one-pass distributed form of weighted sampling (no
      * per-partition reservoir state to merge: TakeOrderedAndProject
      * does the k-selection per partition and the driver merges k-item
      * heaps). Ordering is on the 6-dp-ROUNDED key with doc_id
      * tiebreak — cross-engine stable (a last-ulp ln/pow difference
      * cannot flip the selection boundary). */
    "q134_weighted_sample" -> ((s: SparkSession, dir: String) => {
      val hv = conv(substring(sha2(col("doc_id").cast("string"), 256), 1, 15), 16, 10)
        .cast("long").cast("double")
      val u = (hv + 1.0) / math.pow(2.0, 60) // +1 dodges u = 0
      val key = log(u) / col("n_chars").cast("double")
      Tables(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"), r6(key).as("sample_key"))
        .orderBy(desc("sample_key"), asc("doc_id"))
        .limit(20)
    }),

    /** Deterministic train/val/test split (75/12.5/12.5) keyed on
      * sha-256 of the doc id — stable under re-runs and engine changes,
      * stratification check by language. */
    "q79_train_split" -> ((s: SparkSession, dir: String) => {
      val h1 = substring(sha2(col("doc_id").cast("string"), 256), 1, 1)
      Tables(s, dir, "documents")
        .select(col("lang"), col("n_chars"),
          when(h1 < "c", "train").when(h1 < "e", "val").otherwise("test").as("split"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"), r2n(avg(col("n_chars"))).as("avg_chars"))
        .orderBy(col("split"), col("lang"))
    }),

    /** Embedding-cluster coherence: L2 norm of the per-label centroid
      * (unit-norm inputs → norm near 1 = tight cluster, near 0 =
      * diffuse). posexplode + two-level aggregation — dimension-parallel,
      * no vector ever collected to the driver. */
    "q80_centroid_norm" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("v")).as("c"), count(lit(1)).as("n"))
        .groupBy(col("label"))
        .agg(r6(sqrt(sum(col("c") * col("c")))).as("centroid_norm"),
          max(col("n")).as("n_vectors"))
        .orderBy(col("label"))
    }),

    /** Keep-first windowed dedup over the event feed: one survivor per
      * (user_id, event_type, value) content key, earliest (ts,
      * event_id) wins — the batch twin of
      * EventStreams.dedupWithinWatermark, reported per event type.
      * Single shuffle on the content key; the rank never materializes
      * more than one row of state per key. */
    "q87_dedup_keep_first" -> ((s: SparkSession, dir: String) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"), col("value"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"),
          count_if(col("rn") === 1).as("n_kept"),
          count_if(col("rn") > 1).as("n_removed"))
        .orderBy(col("event_type"))
    }),

    /** Eval-set decontamination: flag training docs sharing any 4-gram
      * with the held-out benchmark slice (doc_id % 50 == 0). The
      * benchmark gram set is tiny relative to the corpus (the realistic
      * shape — eval sets are small), so it broadcasts; grams travel as
      * 32-byte hashes, never text. Production would use 8-13-grams;
      * 4 keeps the fixture signal dense. */
    "q82_decontaminate" -> ((s: SparkSession, dir: String) => {
      // join key = xxhash64 of the 4-gram: 8 bytes instead of a
      // 64-char sha-256 hex, and ~20× cheaper to compute. The oracle
      // joins the raw gram STRINGS — same count unless xxhash64
      // collides across the corpus's distinct grams (~|g|²/2⁶⁵), and a
      // collision shows up as a count mismatch, never silently.
      // Round-16: the gram pass runs as the codegen shingle_hashes
      // kernel (width 4) — bit-identical to the interpreted
      // transform+array_distinct nest, ShingleHashesSpec-pinned.
      graft.functions.ShingleHashes.register(s)
      def grams(docs: org.apache.spark.sql.DataFrame) = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 4)
        .select(col("doc_id"),
          explode(expr("shingle_hashes(toks, 4)")).as("g"))
      val docs = Tables(s, dir, "documents")
      // each side filters BEFORE the gram explode: the benchmark pass
      // touches only the 2% eval slice, not the whole corpus
      val bench = grams(docs.filter(col("doc_id") % 50 === 0)).select(col("g")).distinct()
      grams(docs.filter(col("doc_id") % 50 =!= 0))
        .join(broadcast(bench), Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared_grams"))
        .orderBy(col("doc_id"))
    }),

    /** Lexical diversity per language: corpus token count, vocabulary
      * size, hapax legomena, type-token ratio. Two-level aggregation —
      * the (lang, token) pre-aggregate gives partial map-side combine,
      * so the shuffle carries one row per distinct token, not per
      * occurrence. */
    "q83_lexical_diversity" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("t"))
        .groupBy(col("lang"), col("t")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("lang"))
        .agg(sum(col("cnt")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          count_if(col("cnt") === 1).as("hapax"))
        .select(col("lang"), col("n_tokens"), col("vocab"), col("hapax"),
          round(col("vocab") / col("n_tokens") + lit(1e-12), 6).as("ttr"))
        .orderBy(col("lang"))
    }),

    /** Length filtering by exact percentile band: keep docs whose
      * n_chars lies in [p25, p75] of the corpus. The two thresholds are
      * a 1-row broadcast, computed with the bounded-state two-phase
      * rank quantile ([[graft.ops.Quantiles]]) rather than
      * `percentile`'s O(distinct) agg buffer — exact at any scale. */
    "q81_length_band" -> ((s: SparkSession, dir: String) => {
      val docs = Tables(s, dir, "documents")
      val bounds = graft.ops.Quantiles.exactQuantiles(
        docs, Seq.empty, "n_chars", Seq("p25" -> 0.25, "p75" -> 0.75))
      docs.crossJoin(broadcast(bounds))
        .filter(col("n_chars") >= col("p25") && col("n_chars") <= col("p75"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_in_band"), r2n(avg(col("n_chars"))).as("avg_chars"))
        .orderBy(col("lang"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q75_dedup_apply" -> {
      val pairs = TextDedup.duckJaccard("0.8")
      s"""WITH pairs AS ($pairs),
         |drops AS (SELECT DISTINCT d2 AS doc_id FROM pairs)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
         |CAST(count(drops.doc_id) AS BIGINT) AS n_dropped,
         |CAST(count(*) FILTER (WHERE drops.doc_id IS NULL) AS BIGINT) AS n_kept
         |FROM documents LEFT JOIN drops USING (doc_id)
         |GROUP BY lang
         |ORDER BY lang NULLS FIRST""".stripMargin
    },

    "q76_chunk_dedup" ->
      """WITH chunks AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(string_split(text, ' ')) - 9, 10),
        |    i -> sha256(array_to_string(string_split(text, ' ')[i:i+9], ' ')))) AS h
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 10)
        |SELECT substr(h, 1, 16) AS chunk_hash,
        |CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM chunks GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY chunk_hash NULLS FIRST""".stripMargin,

    "q77_rep_ratio" -> {
      val sh = TextDedup.duckShingles
      s"""WITH sh AS ($sh),
         |dis AS (SELECT doc_id, count(*) AS n_distinct FROM sh GROUP BY doc_id),
         |tot AS (SELECT doc_id, len(string_split(text, ' ')) - 2 AS n_shingles
         |        FROM documents WHERE len(string_split(text, ' ')) >= 3)
         |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
         |CAST(n_distinct AS BIGINT) AS n_distinct,
         |round(1.0 - n_distinct*1.0/n_shingles + 1e-12, 4) AS rep_ratio
         |FROM tot JOIN dis USING (doc_id)
         |ORDER BY rep_ratio DESC NULLS LAST, doc_id NULLS FIRST
         |LIMIT 20""".stripMargin
    },

    "q78_hash_sample" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
        |round(avg(n_chars) + 1e-12, 2) AS avg_chars
        |FROM documents
        |WHERE substr(sha256(text), 1, 1) < '4'
        |GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin,

    // the same 60-bit sha-256 hex fold q36's oracle uses (seed the
    // accumulator BIGINT or the fold overflows INT32)
    "q134_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15), ''),
        |      c -> CAST(CASE WHEN c BETWEEN '0' AND '9' THEN ord(c) - 48
        |                ELSE ord(c) - 87 END AS BIGINT))),
        |    (acc, x) -> acc * 16 + x) AS hv
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars,
        |round(ln((CAST(hv AS DOUBLE) + 1.0) / 1152921504606846976.0)
        |  / CAST(n_chars AS DOUBLE), 6) AS sample_key
        |FROM h
        |ORDER BY sample_key DESC NULLS LAST, doc_id NULLS FIRST
        |LIMIT 20""".stripMargin,

    "q79_train_split" ->
      """SELECT CASE WHEN h1 < 'c' THEN 'train'
        |            WHEN h1 < 'e' THEN 'val'
        |            ELSE 'test' END AS split,
        |lang, CAST(count(*) AS BIGINT) AS n,
        |round(avg(n_chars) + 1e-12, 2) AS avg_chars
        |FROM (SELECT lang, n_chars,
        |      substr(sha256(CAST(doc_id AS VARCHAR)), 1, 1) AS h1
        |      FROM documents)
        |GROUP BY 1, 2
        |ORDER BY split NULLS FIRST, lang NULLS FIRST""".stripMargin,

    "q80_centroid_norm" ->
      """SELECT label,
        |round(sqrt(sum(c * c)), 6) AS centroid_norm,
        |CAST(max(n) AS BIGINT) AS n_vectors
        |FROM (
        |  SELECT label, i, avg(CAST(embedding[i] AS DOUBLE)) AS c,
        |  count(*) AS n
        |  FROM embeddings, generate_series(1, 64) AS t(i)
        |  GROUP BY label, i)
        |GROUP BY label
        |ORDER BY label NULLS FIRST""".stripMargin,

    "q87_dedup_keep_first" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
        |CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_removed
        |FROM (
        |  SELECT event_type, row_number() OVER (
        |    PARTITION BY user_id, event_type, value
        |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS rn
        |  FROM events)
        |GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    "q82_decontaminate" ->
      """WITH grams AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(string_split(text, ' ')) - 3),
        |    i -> array_to_string(string_split(text, ' ')[i:i+3], ' ')))) AS g
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 4),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
        |FROM grams JOIN bench USING (g)
        |WHERE doc_id % 50 != 0
        |GROUP BY doc_id
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q83_lexical_diversity" ->
      """SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |CAST(count(*) AS BIGINT) AS vocab,
        |CAST(count(*) FILTER (WHERE cnt = 1) AS BIGINT) AS hapax,
        |round(count(*) * 1.0 / sum(cnt) + 1e-12, 6) AS ttr
        |FROM (
        |  SELECT lang, t, count(*) AS cnt FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY lang, t)
        |GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin,

    "q81_length_band" ->
      """WITH b AS (SELECT quantile_cont(n_chars, 0.25) AS p25,
        |                  quantile_cont(n_chars, 0.75) AS p75 FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_in_band,
        |round(avg(n_chars) + 1e-12, 2) AS avg_chars
        |FROM documents, b
        |WHERE n_chars >= p25 AND n_chars <= p75
        |GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin
  )
}
