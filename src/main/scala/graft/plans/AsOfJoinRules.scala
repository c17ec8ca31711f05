package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: push left-side conjuncts of a Filter through
  * [[AsOfJoin]]. Catalyst cannot see through a custom node, so without
  * this rule `asof.filter(left_pred)` evaluates AFTER the join — the
  * predicate never reaches the parquet scan and the join processes
  * rows the query immediately discards. Only LEFT-side deterministic
  * predicates are safe: every left row survives the join exactly once
  * (left-outer semantics), so filtering before ≡ filtering after;
  * right-side predicates are NOT pushable (the null-extended
  * non-match rows would change).
  *
  * Registered via `GraftExtensions.injectOptimizerRule` and, for
  * ad hoc sessions, `experimental.extraOptimizations` (see
  * [[graft.ops.AsOf]]).
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j @ AsOfJoin(l, _, _, _, _, _, _)) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(l.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), l))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
