package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's named queries. Each query key appearing in
  * [[queries]] with a matching entry in [[oracleSql]] is hash-compared
  * against DuckDB by the driver at sf0.01; keys without oracle SQL get a
  * weaker rows-only check (used only for ops whose internals are
  * engine-specific hashes, e.g. SimHash / LSH-ANN).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    ops.Relational.queries ++ ops.Profiling.queries ++ ops.Extended.queries ++
    ops.Advanced.queries ++ ops.Statistics.queries ++ ops.Layout.queries ++
    ops.Forensics.queries ++ ops.ForensicsGen.queries ++
    ops.Inference.queries ++ ops.Sketches.queries ++
    ops.GraphAudits.queries ++
    llm.TextDedup.queries ++ llm.TextAnalysis.queries ++
    llm.Similarity.queries ++ llm.Multimodal.queries ++
    llm.PipelineOps.queries ++ llm.CorpusOps.queries ++
    llm.StateStores.queries ++ llm.PairGraph.queries ++
    llm.DupRunStore.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Profiling.oracles ++ ops.Extended.oracles ++
    ops.Advanced.oracles ++ ops.Statistics.oracles ++ ops.Layout.oracles ++
    ops.Forensics.oracles ++ ops.ForensicsGen.oracles ++
    ops.Inference.oracles ++ ops.Sketches.oracles ++
    ops.GraphAudits.oracles ++
    llm.TextDedup.oracles ++ llm.TextAnalysis.oracles ++
    llm.Similarity.oracles ++ llm.Multimodal.oracles ++
    llm.PipelineOps.oracles ++ llm.CorpusOps.oracles ++
    llm.StateStores.oracles ++ llm.PairGraph.oracles ++
    llm.DupRunStore.oracles
}
