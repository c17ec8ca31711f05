package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** GENERALIZED forensics-twin generator — round-10's answer to the
  * round-9 verdict #6: [[Forensics]] shipped three HAND-WRITTEN
  * integer-only twins (q285/q286/q287); this hook derives the twin
  * MECHANICALLY from a one-line substrate declaration, so every
  * float-heavy primary gets a bisection twin for the cost of saying
  * which raw inputs it consumes.
  *
  * A [[Substrate]] names the primary's input table, row filter, group
  * keys, and raw columns; [[frame]] and [[duck]] then generate the
  * Spark plan AND the DuckDB oracle from that single description —
  * the two sides cannot drift apart because neither is written by
  * hand. Every derived statistic is integer-only and engine-proof by
  * construction (the q202/q285 stance):
  *
  *   - string columns: null count, summed character length, and one
  *     literal-substring census per declared needle via the
  *     length-difference identity `len(s) − len(replace(s, c, ''))`
  *     — no regex, no float, no locale;
  *   - numeric columns: null / negative / zero counts (sign censuses
  *     are exact in any engine) and the summed `floor()` (integral
  *     doubles are exact to 2^53; floor BEFORE the cast because
  *     DuckDB's double→int cast rounds while Spark's truncates);
  *   - array columns: null count, summed cardinality, and the summed
  *     negative-element count.
  *
  * Reading a red board: twin green + primary red localizes the
  * divergence to what the primary ADDS (its regex engine, float fold,
  * rounding); twin red exonerates the primary's operators — the
  * shared substrate (fixture decode, string length semantics,
  * grouping) diverged. One round of bisection instead of three
  * (q202 burned rounds 6-8 before elimination found its regex).
  */
object ForensicsGen {

  final case class StrCol(name: String, spark: Column, duckExpr: String,
    needles: Seq[String])
  final case class NumCol(name: String, spark: Column, duckExpr: String)
  final case class ArrCol(name: String, spark: Column, duckExpr: String)

  final case class Substrate(
    twin: String,             // registry name (fresh qNNN — Bench keys
                              // are numeric prefixes, so a twin cannot
                              // share its primary's number)
    primary: String,          // the float-heavy query this twin guards
    table: String,
    sparkFilter: Option[Column],
    duckFilter: Option[String],
    keys: Seq[String],
    strs: Seq[StrCol] = Nil,
    nums: Seq[NumCol] = Nil,
    arrs: Seq[ArrCol] = Nil)

  /** Plain single-column substrates, the common case. */
  private def str(c: String, needles: String*): StrCol =
    StrCol(c, col(c), c, needles)
  private def num(c: String): NumCol = NumCol(c, col(c), c)
  private def arr(c: String): ArrCol = ArrCol(c, col(c), c)

  private def nChar(s: Column, c: String): Column =
    (length(s) - length(call_function("replace", s, lit(c), lit(""))))
      .cast("long")

  // ---------------------------------------------------------------
  // Spark side
  // ---------------------------------------------------------------

  private[graft] def frame(s: SparkSession, dir: String, sub: Substrate): DataFrame = {
    val base0 = Tables(s, dir, sub.table)
    val base = sub.sparkFilter.fold(base0)(base0.filter)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_rows")) ++
      sub.strs.flatMap { sc =>
        Seq(count_if(sc.spark.isNull).as(s"${sc.name}_null"),
          coalesce(sum(length(sc.spark).cast("long")), lit(0L))
            .as(s"${sc.name}_len")) ++
        sc.needles.zipWithIndex.map { case (c, i) =>
          coalesce(sum(nChar(sc.spark, c)), lit(0L)).as(s"${sc.name}_c$i") }
      } ++
      sub.nums.flatMap { nc =>
        Seq(count_if(nc.spark.isNull).as(s"${nc.name}_null"),
          count_if(nc.spark < 0).as(s"${nc.name}_neg"),
          count_if(nc.spark === 0).as(s"${nc.name}_zero"),
          coalesce(sum(floor(nc.spark).cast("long")), lit(0L))
            .as(s"${nc.name}_fsum"))
      } ++
      sub.arrs.flatMap { ac =>
        Seq(count_if(ac.spark.isNull).as(s"${ac.name}_null"),
          coalesce(sum(size(ac.spark).cast("long")), lit(0L))
            .as(s"${ac.name}_size"),
          coalesce(sum(size(filter(ac.spark, x => x < lit(0.0))).cast("long")),
            lit(0L)).as(s"${ac.name}_neg"))
      }
    val grouped = base.groupBy(sub.keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    if (sub.keys.isEmpty) grouped else grouped.orderBy(sub.keys.map(col): _*)
  }

  // ---------------------------------------------------------------
  // DuckDB side — generated from the SAME declaration
  // ---------------------------------------------------------------

  private[graft] def duck(sub: Substrate): String = {
    def q(s: String) = s.replace("'", "''")
    val cols: Seq[String] =
      Seq("CAST(count(*) AS BIGINT) AS n_rows") ++
      sub.strs.flatMap { sc =>
        val e = sc.duckExpr
        Seq(s"CAST(count(*) FILTER ($e IS NULL) AS BIGINT) AS ${sc.name}_null",
          s"CAST(coalesce(sum(len($e)), 0) AS BIGINT) AS ${sc.name}_len") ++
        sc.needles.zipWithIndex.map { case (c, i) =>
          s"CAST(coalesce(sum(len($e) - len(replace($e, '${q(c)}', ''))), 0) " +
            s"AS BIGINT) AS ${sc.name}_c$i" }
      } ++
      sub.nums.flatMap { nc =>
        val e = nc.duckExpr
        Seq(s"CAST(count(*) FILTER ($e IS NULL) AS BIGINT) AS ${nc.name}_null",
          s"CAST(count(*) FILTER ($e < 0) AS BIGINT) AS ${nc.name}_neg",
          s"CAST(count(*) FILTER ($e = 0) AS BIGINT) AS ${nc.name}_zero",
          s"CAST(coalesce(sum(CAST(floor($e) AS BIGINT)), 0) AS BIGINT) " +
            s"AS ${nc.name}_fsum")
      } ++
      sub.arrs.flatMap { ac =>
        val e = ac.duckExpr
        Seq(s"CAST(count(*) FILTER ($e IS NULL) AS BIGINT) AS ${ac.name}_null",
          s"CAST(coalesce(sum(len($e)), 0) AS BIGINT) AS ${ac.name}_size",
          s"CAST(coalesce(sum(len(list_filter($e, x -> x < 0))), 0) " +
            s"AS BIGINT) AS ${ac.name}_neg")
      }
    val select = (sub.keys ++ cols).mkString(",\n")
    val where = sub.duckFilter.fold("")(f => s"\nWHERE $f")
    val tail =
      if (sub.keys.isEmpty) ""
      else {
        val ks = (1 to sub.keys.size).mkString(", ")
        val os = sub.keys.map(k => s"$k NULLS FIRST").mkString(", ")
        s"\nGROUP BY $ks\nORDER BY $os"
      }
    s"SELECT $select\nFROM ${sub.table}$where$tail"
  }

  // ---------------------------------------------------------------
  // the twin board: one declaration per float-heavy primary
  // ---------------------------------------------------------------

  /** Substrate declarations for the thirteen primaries that lean
    * hardest on float folds, regexes, rank windows, or libm — each
    * mirrors its primary's input table and grouping so a driver-side
    * divergence bisects in one round. Adding a twin = one entry. */
  private[graft] val substrates: Seq[Substrate] = Seq(
    Substrate("q323_quality_forensics", "q39_text_quality", "documents",
      None, None, Seq("source"),
      strs = Seq(str("text", " ", ".", ",", "the"))),
    Substrate("q324_langid_forensics", "q41_langid", "documents",
      None, None, Seq("lang"),
      strs = Seq(str("text", " ", "e", "a", "the"))),
    Substrate("q325_ppl_forensics", "q137_bigram_ppl", "documents",
      Some(col("text").isNotNull), Some("text IS NOT NULL"), Seq("lang"),
      strs = Seq(str("text", " "))),
    Substrate("q326_entropy_forensics", "q174_char_entropy", "documents",
      Some(col("text").isNotNull), Some("text IS NOT NULL"), Seq("lang"),
      strs = Seq(str("text", "e", " ", "0"))),
    Substrate("q327_readability_forensics", "q237_readability", "documents",
      None, None, Seq("lang", "source"),
      strs = Seq(str("text", ".", "!", "?", " "))),
    Substrate("q328_gopher_forensics", "q238_gopher_repetition", "documents",
      None, None, Seq("source"),
      strs = Seq(str("text", " ")), nums = Seq(num("n_chars"))),
    Substrate("q329_chargram_forensics", "q240_chargram_profile", "documents",
      Some(col("text").isNotNull && length(col("text")) >= 2),
      Some("text IS NOT NULL AND len(text) >= 2"), Seq("lang"),
      strs = Seq(str("text", " ", "e"))),
    Substrate("q330_pmi_forensics", "q295_pmi_cooccurrence", "documents",
      Some(col("text").isNotNull), Some("text IS NOT NULL"), Seq.empty,
      strs = Seq(str("text", " "))),
    Substrate("q331_spearman_forensics", "q198_spearman", "lineitem",
      None, None, Seq("l_returnflag"),
      nums = Seq(num("l_quantity"), num("l_extendedprice"))),
    Substrate("q332_mad_forensics", "q207_mad_outliers", "events",
      Some(col("value").isNotNull), Some("value IS NOT NULL"),
      Seq("event_type"), nums = Seq(num("value"))),
    Substrate("q333_bootstrap_forensics", "q257_bootstrap_ci", "events",
      Some(col("value").isNotNull), Some("value IS NOT NULL"),
      Seq("event_type"), nums = Seq(num("value"), num("event_id"))),
    Substrate("q334_wquantile_forensics", "q120_weighted_quantiles", "events",
      None, None, Seq("event_type"),
      nums = Seq(num("value"), num("event_id"))),
    Substrate("q335_cosine_forensics", "q42_cosine_topk", "embeddings",
      None, None, Seq("label"),
      arrs = Seq(arr("embedding")))
  )

  val queries: Map[String, Q] =
    substrates.map(sub =>
      sub.twin -> ((s: SparkSession, dir: String) => frame(s, dir, sub))).toMap

  val oracles: Map[String, String] =
    substrates.map(sub => sub.twin -> duck(sub)).toMap
}
