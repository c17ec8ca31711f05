package graft.ops

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import graft.plans.{AsOfJoin, AsOfJoinStrategy, PushFilterThroughAsOfJoin}

/** User-facing API for the native as-of join (see
  * [[graft.plans.AsOfJoinExec]] for semantics and scale design).
  *
  * Columns are resolved by NAME against each side's analyzed output,
  * so callers never touch Catalyst expressions. The planner strategy
  * is injected by `GraftExtensions`
  * (`spark.sql.extensions=graft.functions.GraftExtensions`); for
  * sessions built without the config this helper also registers it via
  * `experimental.extraStrategies`, which takes effect immediately. */
object AsOf {
  def joinBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    def attr(df: DataFrame, name: String) =
      df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof: column $name not found in [${df.columns.mkString(", ")}]"))
    val plan = AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      attr(left, leftKey), attr(right, rightKey),
      attr(left, leftTs), attr(right, rightTs))
    GraftSqlBridge.ofRows(spark, plan)
  }
}
