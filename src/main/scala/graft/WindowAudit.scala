package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan}

/** Dev harness: dump every window operator's partition spec across all
  * registered queries — the input for the PlanQualitySpec guard against
  * low-cardinality window partitions. runMain graft.WindowAudit [sfDir] */
object WindowAudit {

  /** Deep pre-order walk that crosses the plan-in-a-field boundaries
    * `SparkPlan.collect` cannot see: AQE stage wrappers (the defining
    * projection of a window partition key sits BELOW the exchange, so
    * post-AQE it lives inside a ShuffleQueryStageExec) and cached
    * relations. */
  def deep(p: SparkPlan): Seq[SparkPlan] = {
    val through: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case c: InMemoryTableScanExec => Seq(c.relation.cachedPlan)
      case _ => p.children
    }
    p +: (through.flatMap(deep) ++ p.subqueries.flatMap(deep))
  }

  /** Resolve a window partition expression to the source-column names it
    * ultimately references, chasing internal aliases (`_w0`, `_pid`, …)
    * down through the child plan's projections. */
  def resolveRefs(e: Expression, below: SparkPlan): Set[String] = {
    // an alias can be minted by any node (Project, HashAggregate result
    // expressions, Expand, Generate) — harvest them all
    val aliases: Map[Long, Expression] = deep(below)
      .flatMap(_.expressions)
      .flatMap(_.collect { case a: Alias => a.exprId.id -> a.child })
      .toMap
    def go(x: Expression, seen: Set[Long]): Set[String] = x match {
      case a: Attribute if aliases.contains(a.exprId.id) && !seen(a.exprId.id) =>
        go(aliases(a.exprId.id), seen + a.exprId.id)
      case a: Attribute => Set(a.name)
      case other if other.children.isEmpty && other.references.isEmpty =>
        // leaf non-attribute: literal, spark_partition_id(), mono-id …
        Set(s"<${other.prettyName}>")
      case other =>
        val kids = other.children.flatMap(go(_, seen)).toSet
        if (kids.isEmpty) Set(s"<${other.prettyName}>") else kids
    }
    go(e, Set.empty)
  }

  def collectWindows(p: SparkPlan): Seq[(String, Seq[String])] =
    deep(p).collect {
      case w: WindowExec =>
        ("Window", w.partitionSpec.map(e =>
          resolveRefs(e, w.child).toSeq.sorted.mkString("+")))
      case w: WindowGroupLimitExec =>
        ("WindowGroupLimit", w.partitionSpec.map(e =>
          resolveRefs(e, w.child).toSeq.sorted.mkString("+")))
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-window-audit")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val ws = collectWindows(plan)
        ws.foreach { case (kind, spec) =>
          println(s"WINAUDIT $name $kind [${spec.mkString(", ")}]")
        }
      } catch {
        case e: Throwable => println(s"WINAUDIT $name FAILED ${String.valueOf(e).take(120)}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
