package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native functions
  * available to any session (including pure-SQL users) via
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * Programmatic sessions can equally call VectorFunctions.register.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** The (arr, k)-shaped builders must validate like the register()
    * path in [[MinhashSignature]]/[[SimHashFingerprint]]: a BIGINT
    * literal k, a non-foldable k, or a wrong arity gets a readable
    * error, not a ClassCastException/IndexOutOfBounds. */
  private def literalK(name: String, exprs: Seq[Expression]): Int = {
    require(exprs.length == 2 && exprs(1).foldable,
      s"$name(arr, k) needs a literal k")
    exprs(1).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$name k must be an integer literal, got $other")
    }
  }

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_sim(a, b) takes two vectors")
        CosineSimilarity(exprs(0), exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_sig"),
      (exprs: Seq[Expression]) =>
        MinhashSignature(exprs(0), literalK("minhash_sig", exprs))))
    extensions.injectFunction((
      FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimHashFingerprint].getName, "simhash_fp"),
      (exprs: Seq[Expression]) =>
        SimHashFingerprint(exprs(0), literalK("simhash_fp", exprs))))
    // whole-operator surface: the native as-of join planner strategy
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // Catalyst cannot push filters or limits through a custom node by
    // itself
    extensions.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    extensions.injectOptimizerRule(_ => graft.plans.PushLimitThroughAsOfJoin)
  }
}
