package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFunctions

/** The codegen'd bloom probe: sketch contract (no false negatives,
  * bounded false positives), plan shape, and the q108 bloom-gated
  * dedup's exact equivalence to the plain anti-join q97. */
class BloomFunctionsSpec extends SparkSuite {

  test("no false negatives, false-positive rate near nominal, codegen probe") {
    val members = spark.range(0, 10000).select(col("id").as("k"))
    val filter = members.stat.bloomFilter("k", 10000, 0.01)

    val probedMembers = members.filter(BloomFunctions.mightContain(filter, col("k")))
    assert(probedMembers.count() == 10000L, "a bloom filter must never miss a member")

    val nonMembers = spark.range(1000000, 1100000).select(col("id").as("k"))
    val fp = nonMembers.filter(BloomFunctions.mightContain(filter, col("k"))).count()
    assert(fp < 100000 * 0.05, s"fp rate ${fp / 100000.0} far above nominal 0.01")

    val plan = probedMembers.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
    // the "*(n)" node prefix is the whole-stage-codegen stage marker
    assert(plan.linesIterator.exists(l => l.contains("Filter") && l.contains("*(")),
      s"probe must stay inside whole-stage codegen:\n$plan")
  }

  test("null probe is three-valued: filter drops it, negation-with-coalesce recovers it") {
    import spark.implicits._
    val filter = spark.range(0, 10).select(col("id").as("k")).stat.bloomFilter("k", 10, 0.01)
    val df = Seq(Some(1L), Some(99L), None).toDF("k")
    val mc = BloomFunctions.mightContain(filter, col("k"))
    assert(df.filter(mc).count() == 1L) // member only; null dropped
    assert(df.filter(coalesce(!mc, lit(true))).count() == 2L) // non-member + null
  }

  test("q108 bloom-gated dedup returns exactly q97's rows") {
    val a = llm.CorpusOps.queries("q97_incremental_dedup")(spark, sf)
    val b = llm.CorpusOps.queries("q108_bloom_dedup")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "the bloom gate must be a pure accelerator, never a semantic change")
  }
}
