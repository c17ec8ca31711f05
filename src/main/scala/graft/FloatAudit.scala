package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Cross-engine float-portability audit — the static complement of the
  * driver's hash gate. Every double column a query EMITS is compared
  * bit-for-bit against DuckDB, so its value must be reproducible across
  * two independent engines. Three expression shapes are:
  *
  *   - NUDGED_ROUND — `round(x + 1e-12, n)`: the repo convention for any
  *     rounded double. The nudge pushes on-grid rationals (q39's
  *     `a/n + b/m` ties) and last-ulp fold differences off the
  *     round-half boundary in BOTH engines, making the rounded value
  *     order- and libm-independent.
  *   - INT_EXACT — arithmetic over integer-derived values only (counts,
  *     sums of longs, ids), no rounding, no transcendental calls: IEEE
  *     +,-,*,/ on the same integer inputs is bit-identical everywhere.
  *   - allowlisted — anything else, with a per-(query, column) rationale
  *     (rank-based outputs, folds provably off-grid, values pinned by an
  *     order-fixing construction), reviewed like PlanQualitySpec's BNLJ
  *     list.
  *
  * Everything else is a lint failure: an unordered float fold or an
  * un-nudged round is exactly the class that produced the q202 red row
  * in round 7 (per-doc `avg(nt*100/nc)` rounded 6 decimals apart by two
  * engines).
  *
  * Also a dev harness: `runMain graft.FloatAudit [sfDir]` dumps the
  * classification for every registered query.
  */
object FloatAudit {

  /** How a double output column is produced, resolved through aliases. */
  sealed trait Verdict
  case object NudgedRound extends Verdict
  case object IntExact extends Verdict
  /** Rounded value whose float inputs flow through data-volume folds
    * (sum/avg/... over parquet doubles) or libm calls: accumulated
    * float error keeps the value off the round-half grid in practice —
    * the measured stance behind 7 rounds of green driver hashes. The
    * tie-prone class is rationals of SMALL integers, which this is
    * not. */
  case object RoundedFold extends Verdict
  /** The column only SELECTS stored float values (projection, window
    * lag/first, min/max, conditionals) without arithmetic: both engines
    * read the identical bits from the same parquet, so the output is
    * exact with no rounding needed. */
  case object PassThrough extends Verdict
  /** The reason string names the first offending construct. */
  case class Unsafe(reason: String) extends Verdict

  // Catalyst expression class names (prettyName) whose results are
  // libm-dependent: two correct engines can differ in the last ulp, so
  // their raw output is not portable and must be nudged-then-rounded.
  private val transcendental = Set(
    "log", "ln", "log2", "log10", "log1p", "exp", "expm1", "power", "pow",
    "cbrt", "sin", "cos", "tan", "asin", "acos", "atan", "atan2", "sinh",
    "cosh", "tanh")

  private def aliasMap(plan: LogicalPlan): Map[Long, Expression] =
    plan.collect { case n => n }
      .flatMap(_.expressions)
      .flatMap(_.collect { case a: Alias => a.exprId.id -> a.child })
      .toMap

  private def isNudge(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => v == 1e-12
    case _ => false
  }

  /** Classify the expression tree producing one double output column.
    * `aliases` chases attributes minted by lower plan nodes (aggregates,
    * projections, windows) so the walk sees the WHOLE computation down
    * to source columns. */
  def classify(root: Expression, aliases: Map[Long, Expression]): Verdict = {
    // resolve the top through aliases to find the outermost real node
    def resolveTop(e: Expression, seen: Set[Long]): Expression = e match {
      case a: Attribute if aliases.contains(a.exprId.id) && !seen(a.exprId.id) =>
        resolveTop(aliases(a.exprId.id), seen + a.exprId.id)
      case other => other
    }
    val top = resolveTop(root, Set.empty)

    def floatTyped(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case DoubleType | FloatType => true
      case org.apache.spark.sql.types.ArrayType(e, _) => floatTyped(e)
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => floatTyped(f.dataType))
      case m: org.apache.spark.sql.types.MapType =>
        floatTyped(m.keyType) || floatTyped(m.valueType)
      case _ => false
    }

    // Nodes that only SELECT or route values (no float arithmetic):
    // a float flowing exclusively through these is bit-preserved.
    val selecting = Set(
      "alias", "cast", "if", "casewhen", "coalesce", "nvl", "nanvl",
      "lag", "lead", "first", "first_value", "last", "last_value",
      "nth_value", "min", "max", "greatest", "least", "windowspecdefinition",
      "windowexpression", "named_struct", "getstructfield", "element_at",
      "getarrayitem", "tagged", "outer")

    // walk the full tree (through aliases) collecting portability facts
    var floatLeaf: Option[String] = None  // any float-typed source column
    var transFn: Option[String] = None    // any libm-dependent call
    var rounds = 0                        // round()/bround() nodes seen
    var unNudged = 0                      // ... of which lack the +1e-12
    var mathAboveRound = false            // arithmetic APPLIED TO a rounded value
    var arithmetic = false                // any non-selecting computation node
    // returns whether the subtree contains a round node
    def walk(e: Expression, seen: Set[Long]): Boolean = e match {
      case a: Attribute if aliases.contains(a.exprId.id) && !seen(a.exprId.id) =>
        walk(aliases(a.exprId.id), seen + a.exprId.id)
      case a: Attribute =>
        if (floatTyped(a.dataType) && floatLeaf.isEmpty) floatLeaf = Some(a.name)
        false
      case _: Literal => false
      case other =>
        val pn = other.prettyName.toLowerCase
        if (transcendental(pn) && transFn.isEmpty) transFn = Some(pn)
        val isRound = pn == "round" || pn == "bround"
        if (isRound) {
          rounds += 1
          if (!other.children.head.exists(isNudge)) unNudged += 1
        } else if (!selecting(pn)) arithmetic = true
        val childHasRound =
          other.children.map(walk(_, seen)).exists(identity)
        // a computation node (not mere selection/routing) over an
        // already-rounded value re-introduces float arithmetic AFTER
        // the portability cut — the rounded value must be the LAST step
        if (childHasRound && !isRound && !selecting(pn)) mathAboveRound = true
        isRound || childHasRound
    }
    walk(top, Set.empty)

    if (rounds > 0) {
      if (mathAboveRound) Unsafe("arithmetic applied above a round " +
        "(rounding must be the final step)")
      else if (unNudged == 0) NudgedRound
      else if (floatLeaf.nonEmpty || transFn.nonEmpty) RoundedFold
      else Unsafe("un-nudged round of an integer-derived rational " +
        "(round-half tie class: q39/q202)")
    } else {
      if (floatLeaf.nonEmpty && !arithmetic) PassThrough
      else if (floatLeaf.nonEmpty)
        Unsafe(s"unrounded expr over float column '${floatLeaf.get}'")
      else if (transFn.nonEmpty)
        Unsafe(s"unrounded libm call ${transFn.get}()")
      else IntExact
    }
  }

  /** (column, verdict) for every Double/Float output column of `df`. */
  def audit(df: DataFrame): Seq[(String, Verdict)] = {
    val plan = df.queryExecution.analyzed
    val aliases = aliasMap(plan)
    plan.output.collect {
      case a if a.dataType == DoubleType || a.dataType == FloatType =>
        a.name -> classify(a, aliases)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("graft-float-audit")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      audit(SparkEntry.queries(name)(spark, sfDir)).foreach {
        case (c, v) => println(s"[floataudit] $name.$c -> $v")
      }
    }
    spark.stop()
  }
}
