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
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    extensions.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_sig"),
      (exprs: Seq[Expression]) =>
        MinhashSignature(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    extensions.injectFunction((
      FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimHashFingerprint].getName, "simhash_fp"),
      (exprs: Seq[Expression]) =>
        SimHashFingerprint(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    // whole-operator surface: the native as-of join planner strategy
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // Catalyst cannot push filters or limits through a custom node by
    // itself
    extensions.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    extensions.injectOptimizerRule(_ => graft.plans.PushLimitThroughAsOfJoin)
  }
}
