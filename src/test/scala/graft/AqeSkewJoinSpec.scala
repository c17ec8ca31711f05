package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: with a 99%-hot join key and broadcast
  * disabled, adaptive execution must split the skewed partition
  * (SortMergeJoin(skew=true)) — the runtime half of the skew story
  * (graft.ops.Salting covers the aggregation half). */
class AqeSkewJoinSpec extends SparkSuite {

  test("AQE marks and splits the skewed partition of a hot-key join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 99% of left rows share key 0; right is uniform
      val left = spark.range(0, 1000000)
        .select(when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id") % 1000).as("k"),
          col("id").as("v"))
      val right = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS frame's plan (count() would build and adapt a
      // separate one, leaving joined's AQE plan unfinalized)
      var n = 0L
      joined.toLocalIterator().forEachRemaining(_ => n += 1)
      assert(n == 1000000L) // every left row matches exactly one right row
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n${finalPlan.take(1500)}")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
