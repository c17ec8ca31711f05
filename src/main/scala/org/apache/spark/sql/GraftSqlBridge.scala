package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft needs: turning a hand-built
  * [[LogicalPlan]] (the custom AsOfJoin node) into a DataFrame. The
  * `classic.Dataset` companion is `private[sql]`, so this object lives
  * in Spark's package solely to reach `ofRows` — the standard
  * extension-library technique; nothing else of Spark's internals is
  * touched. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
