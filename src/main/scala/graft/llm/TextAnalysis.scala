package graft.llm

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables, r2, r4, r6}

/** Text-analysis operators for training-data curation: token statistics,
  * quality scoring (length / stopword / lexical-diversity signals, after
  * Gopher/C4-style filters), whitespace + BPE-ish token counting, and a
  * language-ID heuristic.
  *
  * All of these are single-pass column expressions — no UDFs, fully
  * codegen'd, shuffling only grouped outputs — so they run at scan
  * speed on 100 TB.
  */
object TextAnalysis {


  // tokenization is hoisted into a `toks` projection in each query so
  // it runs once per row — inlining split(text) into every derived
  // expression would re-tokenize the document per expression
  private val toks = col("toks")
  private val nTokens = size(toks).cast("long")

  private def withToks(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("toks", split(col("text"), " "))

  val queries: Map[String, Q] = Map(

    /** Corpus token statistics per language. */
    "q38_token_stats" -> ((s: SparkSession, dir: String) => {
      withToks(Tables(s, dir, "documents"))
        .select(col("lang"), col("source"), col("n_chars"), nTokens.as("n_tok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          r4(avg(col("n_tok"))).as("avg_tokens"),
          r4(avg(col("n_chars"))).as("avg_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    }),

    /** Per-document quality scoring: token count, type-token ratio,
      * stopword ratio, mean token length, and a composite score —
      * the C4/Gopher-style signal set expressed as pure columns. */
    "q39_text_quality" -> ((s: SparkSession, dir: String) => {
      val nUniq = size(array_distinct(toks)).cast("long")
      val nStop = size(expr("filter(toks, t -> t IN ('the', 'a'))")).cast("long")
      val charsNoSpace = length(regexp_replace(col("text"), " ", "")).cast("double")
      withToks(Tables(s, dir, "documents"))
        .select(col("doc_id"),
          nTokens.as("n_tokens"),
          nUniq.as("n_uniq"),
          r4(nUniq / nTokens.cast("double")).as("ttr"),
          r6(nStop / nTokens.cast("double")).as("stop_ratio"),
          r4(charsNoSpace / nTokens.cast("double")).as("avg_tok_len"),
          // + 1e-12 pushes exact round-half ties (possible for these
          // small-denominator rationals) off the boundary the same way
          // in both engines — Spark's BigDecimal HALF_UP and DuckDB's
          // C-style rounding otherwise disagree exactly at *.xxxx5
          r4(lit(0.5) * (nUniq / nTokens.cast("double")) +
            lit(0.3) * (lit(1.0) - nStop / nTokens.cast("double")) +
            lit(0.2) * least(nTokens.cast("double") / 100.0, lit(1.0)) +
            lit(1e-12)).as("quality_score"))
        .orderBy(col("doc_id"))
    }),

    /** Token counting: whitespace tokens and a BPE-ish estimate
      * (subword pieces ≈ ceil(chars/4), the common ~4-chars/token
      * heuristic), per source. */
    "q40_token_count" -> ((s: SparkSession, dir: String) => {
      withToks(Tables(s, dir, "documents"))
        .select(col("source"), nTokens.as("n_ws"),
          ceil(length(col("text")).cast("double") / 4.0).cast("long").as("n_bpe"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_ws")).as("ws_tokens"),
          sum(col("n_bpe")).as("bpe_tokens"),
          r4(avg(col("n_bpe") / col("n_ws").cast("double"))).as("bpe_per_ws"))
        .orderBy(col("source"))
    }),

    /** Language-ID heuristic vs the labeled lang column. On real
      * corpora this is char-n-gram profiling (Cavnar-Trenkle); this
      * synthetic corpus shares one 31-word vocabulary across langs, so
      * the demo classifies on English-stopword density — the point is
      * the deterministic, single-pass operator shape. */
    "q41_langid" -> ((s: SparkSession, dir: String) => {
      val stopRatio = size(expr("filter(toks, t -> t IN ('the', 'a'))"))
        .cast("double") / nTokens.cast("double")
      val predicted = when(stopRatio >= 0.08, "en_high")
        .when(stopRatio >= 0.04, "en")
        .when(stopRatio > 0.0, "en_low")
        .otherwise("und")
      withToks(Tables(s, dir, "documents"))
        .select(col("lang"), predicted.as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q38_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |cast(sum(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
        |round(avg(len(string_split(text,' '))),4) AS avg_tokens,
        |round(avg(n_chars),4) AS avg_chars,
        |count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin,

    "q39_text_quality" ->
      """SELECT doc_id,
        |cast(nt AS BIGINT) AS n_tokens, cast(nu AS BIGINT) AS n_uniq,
        |round(nu*1.0/nt, 4) AS ttr,
        |round(ns*1.0/nt, 6) AS stop_ratio,
        |round(cns*1.0/nt, 4) AS avg_tok_len,
        |round(0.5*(nu*1.0/nt) + 0.3*(1.0 - ns*1.0/nt) + 0.2*least(nt/100.0, 1.0) + 1e-12, 4) AS quality_score
        |FROM (
        |  SELECT doc_id,
        |  len(string_split(text,' ')) AS nt,
        |  len(list_distinct(string_split(text,' '))) AS nu,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS ns,
        |  length(replace(text, ' ', '')) AS cns
        |  FROM documents)
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q40_token_count" ->
      """SELECT source, count(*) AS n_docs,
        |cast(sum(n_ws) AS BIGINT) AS ws_tokens,
        |cast(sum(n_bpe) AS BIGINT) AS bpe_tokens,
        |round(avg(n_bpe*1.0/n_ws),4) AS bpe_per_ws
        |FROM (SELECT source, len(string_split(text,' ')) AS n_ws,
        |      cast(ceil(length(text)/4.0) AS BIGINT) AS n_bpe FROM documents)
        |GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin,

    "q41_langid" ->
      """SELECT lang, predicted, count(*) AS n FROM (
        |  SELECT lang,
        |  CASE WHEN sr >= 0.08 THEN 'en_high'
        |       WHEN sr >= 0.04 THEN 'en'
        |       WHEN sr > 0.0 THEN 'en_low'
        |       ELSE 'und' END AS predicted
        |  FROM (SELECT lang,
        |        len(list_filter(string_split(text,' '), t -> t IN ('the','a')))*1.0
        |          / len(string_split(text,' ')) AS sr
        |        FROM documents))
        |GROUP BY lang, predicted
        |ORDER BY lang NULLS FIRST, predicted NULLS FIRST""".stripMargin
  )
}
