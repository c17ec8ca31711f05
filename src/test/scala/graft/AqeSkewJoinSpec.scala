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

  test("as-of exchanges are ordinary shuffles that AQE coalesces; skew-split must NOT fire") {
    // AsOfJoinExec declares ClusteredDistribution, so EnsureRequirements
    // inserts plain ShuffleExchangeExec nodes. With a deliberately
    // oversized partition count and tiny data, AQE must coalesce those
    // exchanges down like any SMJ's — proving they are unspecialized
    // shuffles — while OptimizeSkewedJoin (which only matches SMJ/SHJ)
    // must never split them: the merge needs every row of a key in ONE
    // partition.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1b",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB",
      "spark.sql.shuffle.partitions" -> "64")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val l = (1 to 5000).map(i => ((i % 40).toLong, i.toLong, i)).toDF("k", "ts", "v")
      val r = (1 to 5000).map(i => ((i % 40).toLong, (i - 3).toLong, i * 2)).toDF("rk", "rts", "w")
      val joined = graft.ops.AsOf.joinBackward(l, r, "k", "rk", "ts", "rts")
      var n = 0L
      joined.toLocalIterator().forEachRemaining(_ => n += 1)
      assert(n == 5000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"))
      assert(plan.contains("AQEShuffleRead") || plan.contains("coalesced"),
        s"AQE must coalesce the as-of exchanges:\n${plan.take(2000)}")
      assert(!plan.contains("skew=true"),
        "skew-split must never apply to the as-of merge")
      // the coalesced read must preserve key clustering: every key's
      // rows still meet in exactly one partition, or the merge would
      // silently drop matches — count nulls as the tripwire
      assert(joined.filter(col("w").isNull).count() == 0L,
        "coalesced exchanges must preserve co-clustering of keys")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
