package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import graft.llm.TextDedup

/** Cross-validation of the hand-rolled MinHash+LSH dedup against Spark
  * ML's independent MinHashLSH implementation: two unrelated codepaths
  * agreeing on the near-dup pair set is strong evidence the banding /
  * verification math is right (beyond the DuckDB oracle, which shares
  * our shingle definition). */
class SparkMlCrossCheckSpec extends SparkSuite {

  test("spark.ml MinHashLSH agrees with the engine's near-dup pairs") {
    val docs = Tables(spark, sf, "documents")
    // same 3-shingle definition as TextDedup.shingleSet
    val shingled = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3))))")
        .as("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val featured = tf.transform(shingled)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(16).setSeed(42L)
    val model = lsh.fit(featured)
    val mlPairs = model.approxSimilarityJoin(featured, featured, 0.5, "jaccard_dist")
      .select(col("datasetA.doc_id").as("d1"), col("datasetB.doc_id").as("d2"),
        col("jaccard_dist"))
      .filter(col("d1") < col("d2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (1.0 - r.getDouble(2))).toMap

    val enginePairs = TextDedup.queries("q34_dedup_jaccard")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) -> r.getAs[Double]("jaccard"))
      .toMap

    assert(enginePairs.nonEmpty)
    // HashingTF bins shingles into 2^18 buckets, so the ML-side jaccard
    // can shift by ~1/|union| per collision — compare with a collision
    // margin rather than demanding exact-set equality at the threshold.
    val collisionMargin = 0.02
    val mlConfirmed = mlPairs.filter(_._2 >= 0.5 + collisionMargin)
    val missedByEngine = mlConfirmed.keySet.diff(enginePairs.keySet)
    assert(missedByEngine.isEmpty,
      s"engine missed pairs ml rates clearly above threshold: $missedByEngine")
    // ml (approximate) should recover the vast majority of exact pairs
    val recall = enginePairs.keySet.intersect(mlPairs.keySet).size.toDouble / enginePairs.size
    assert(recall >= 0.9, s"spark.ml recall $recall over ${enginePairs.size} pairs")
    // and where both report a jaccard, the values must agree to margin
    enginePairs.foreach { case (pair, j) =>
      mlPairs.get(pair).foreach { mlJ =>
        assert(math.abs(mlJ - j) < collisionMargin, s"$pair: engine $j vs ml $mlJ")
      }
    }
  }
}
