package graft

/** Dev harness: print ONE query's executed plan (post-AQE) for
  * inspection. runMain graft.PlanOne <name> [sfDir] */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("graft-plan-one",
      extraConfigs = Map("spark.sql.maxMetadataStringLength" -> "200"))
    val df = SparkEntry.queries(name)(spark, sfDir)
    // formatted plan FIRST (pre-execution — the §7.2 read: operator
    // list, PushedFilters/ReadSchema, join strategy, codegen spans)
    println("== explain(formatted) ==")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    df.collect() // drive THIS QueryExecution so AQE finalizes in place
    println("== executed plan (post-AQE) ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
