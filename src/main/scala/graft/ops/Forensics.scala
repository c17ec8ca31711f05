package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Integer-only FORENSICS TWINS — the bisection surface the round-8
  * verdict asked for (Missing #3): when a primary query fails the
  * driver's cross-engine hash gate, a twin that re-aggregates the
  * same inputs through a strictly SMALLER feature set (no regex, no
  * floats, no libm — only length arithmetic, literal-substring
  * counting, and integer sums) localizes the divergence to a layer in
  * ONE round instead of three (q202 burned rounds 6-8 before its
  * regex dependency was identified by elimination):
  *
  *   - twin green + primary red → the divergence lives in what the
  *     primary adds (its regex engine, float rounding, or fold);
  *   - twin red too → the shared substrate diverges (string length
  *     semantics, fixture decode, grouping), and the primary's own
  *     operators are exonerated.
  *
  * Twins exist for the three queries whose primaries lean hardest on
  * engine-version-sensitive machinery: q202 (codepoint classes over
  * CJK), q95 (three PII regexes), q56 (regex extraction over JSON
  * props). Char counting uses the length-difference identity
  * `length(s) − length(replace(s, c, ''))` — exact, regex-free, and
  * identical in any conforming engine.
  */
object Forensics {

  /** The q95 synthetic-PII augmentation, reproduced verbatim so the
    * twin measures the same strings the primary scans
    * (CorpusOps `q95_pii_redact`). */
  private def aug = {
    val d = col("doc_id")
    concat(col("text"),
      lit(" reach user"), (d % 100).cast("string"),
      lit("@mail.com or 10."), (d % 256).cast("string"),
      lit("."), ((d * 7) % 256).cast("string"),
      lit("."), ((d * 13) % 256).cast("string"),
      lit(" call 555-"), lpad((d % 10000).cast("string"), 4, "0"))
  }

  private def nChar(s: org.apache.spark.sql.Column, c: String) =
    (length(s) - length(call_function("replace", s, lit(c), lit("")))).cast("long")

  val queries: Map[String, Q] = Map(

    /** q202's substrate, isolated: per-language doc and char counts
      * plus the ASCII-space census — everything the fertility query
      * consumes BELOW its token-run classification. Same row filter
      * as the primary. */
    "q285_fertility_forensics" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"),
          sum(nChar(col("text"), " ")).as("total_spaces"))
        .orderBy(col("lang"))
    }),

    /** q95's substrate, isolated: the augmented string's length and
      * its literal '@' / '.' / '-' character censuses per source —
      * everything below the three PII regexes. */
    "q286_pii_forensics" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .select(col("source"), aug.as("a"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("a").isNull).as("n_null"),
          sum(length(col("a")).cast("long")).as("sum_aug_len"),
          sum(nChar(col("a"), "@")).as("n_at"),
          sum(nChar(col("a"), ".")).as("n_dot"),
          sum(nChar(col("a"), "-")).as("n_dash"))
        .orderBy(col("source"))
    }),

    /** q56's substrate, isolated: per-event-type props length and
      * digit-char census (ten literal replaces — no character class,
      * no regex), below the primary's regexp_extract/regexp_replace. */
    "q287_props_forensics" -> ((s: SparkSession, dir: String) => {
      val digits = (0 to 9).foldLeft(col("props")) { (c, d) =>
        call_function("replace", c, lit(d.toString), lit(""))
      }
      Tables(s, dir, "events")
        .select(col("event_type"), col("props"),
          (length(col("props")) - length(digits)).cast("long").as("n_digit"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("props")).cast("long")).as("sum_len"),
          sum(col("n_digit")).as("digit_chars"))
        .orderBy(col("event_type"))
    })
  )

  private def duckNChar(s: String, c: String) =
    s"(len($s) - len(replace($s, '$c', '')))"

  // single line: this fragment is interpolated into stripMargin
  // oracles, where a leading || would lose a pipe to the margin strip
  private val duckAug =
    "text || ' reach user' || CAST(doc_id % 100 AS VARCHAR) " +
    "|| '@mail.com or 10.' || CAST(doc_id % 256 AS VARCHAR) " +
    "|| '.' || CAST((doc_id * 7) % 256 AS VARCHAR) " +
    "|| '.' || CAST((doc_id * 13) % 256 AS VARCHAR) " +
    "|| ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"

  val oracles: Map[String, String] = Map(

    "q285_fertility_forensics" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |CAST(sum(len(text)) AS BIGINT) AS total_chars,
         |CAST(sum(${duckNChar("text", " ")}) AS BIGINT) AS total_spaces
         |FROM documents
         |WHERE text IS NOT NULL AND len(text) > 0
         |GROUP BY lang
         |ORDER BY lang NULLS FIRST""".stripMargin,

    "q286_pii_forensics" ->
      s"""WITH a AS (SELECT source, $duckAug AS a FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |CAST(count(*) FILTER (a IS NULL) AS BIGINT) AS n_null,
         |CAST(sum(len(a)) AS BIGINT) AS sum_aug_len,
         |CAST(sum(${duckNChar("a", "@")}) AS BIGINT) AS n_at,
         |CAST(sum(${duckNChar("a", ".")}) AS BIGINT) AS n_dot,
         |CAST(sum(${duckNChar("a", "-")}) AS BIGINT) AS n_dash
         |FROM a
         |GROUP BY source
         |ORDER BY source NULLS FIRST""".stripMargin,

    "q287_props_forensics" -> {
      val digits = (0 to 9).foldLeft("props") { (c, d) =>
        s"replace($c, '$d', '')"
      }
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |CAST(sum(len(props)) AS BIGINT) AS sum_len,
         |CAST(sum(len(props) - len($digits)) AS BIGINT) AS digit_chars
         |FROM events
         |GROUP BY event_type
         |ORDER BY event_type NULLS FIRST""".stripMargin
    }
  )
}
