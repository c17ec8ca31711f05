package graft

import org.apache.spark.sql.functions._
import graft.llm.CurationMain

/** The capstone curation recipe must hold its end-to-end guarantees:
  * monotone funnel, no surviving exact/near duplicates, zero eval-set
  * contamination, and a complete, deterministic split. */
class CurationSpec extends SparkSuite {

  private lazy val (curated, funnel) = CurationMain.curate(spark, sf)

  test("funnel is monotone and every stage retains something") {
    val f = funnel
    assert(f.input >= f.afterQuality)
    assert(f.afterQuality >= f.afterExact)
    assert(f.afterExact >= f.afterNearDup)
    assert(f.afterNearDup >= f.afterDecontam)
    assert(f.afterDecontam > 0, "curation must not drop the whole corpus")
    assert(f.train + f.`val` + f.test == f.afterDecontam)
  }

  test("curated corpus has no exact duplicates and no verified near-dup pairs") {
    val n = curated.count()
    assert(curated.select(sha2(col("text"), 256)).distinct().count() == n)
    val survivors = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = llm.TextDedup.queries("q35_dedup_minhash")(spark, sf)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bothSurvive = pairs.filter { case (a, b) => survivors(a) && survivors(b) }
    assert(bothSurvive.isEmpty, s"near-dup pairs survived curation: ${bothSurvive.take(5).toSeq}")
  }

  test("curated corpus shares no 4-gram with the eval slice") {
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 4)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 3),
          |  i -> concat_ws(' ', slice(toks, i, 4)))""".stripMargin)).as("g"))
      .distinct()
    val evalGrams = grams(Tables(spark, sf, "documents")
      .filter(col("doc_id") % 50 === 0))
    val overlap = grams(curated).join(evalGrams, Seq("g"), "left_semi").count()
    assert(overlap == 0, s"$overlap contaminated 4-grams survived")
    assert(curated.filter(col("doc_id") % 50 === 0).count() == 0,
      "eval-slice docs themselves must not be in the training corpus")
  }

  test("near-dup stage serves from the persisted pair graph, not document text") {
    val drops = CurationMain.nearDupDrops(spark, sf)
    drops.count() // force the serve-store seed before reading the plan
    val plan = drops.queryExecution.executedPlan.toString
    assert(plan.contains("/tmp/graft_state/"),
      "near-dup drop plan must scan the persisted pair-graph store")
    assert(!plan.contains("documents.parquet"),
      "near-dup drop plan must not rescan document text")
    // funnel-unchanged pin: the store-served exact ≥ 0.8 drop set must
    // equal the LSH-banded verified path's (recall 1 - 1e-5 per pair,
    // and the store is exact — any divergence is a store bug)
    val lsh = llm.TextDedup.queries("q35_dedup_minhash")(spark, sf)
      .select(col("d2").as("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val served = drops.collect().map(_.getLong(0)).toSet
    assert(served == lsh,
      s"store-served drops diverge from the verified LSH path: " +
        s"only-served=${(served -- lsh).take(5)} only-lsh=${(lsh -- served).take(5)}")
  }

  test("split is deterministic and train-dominant") {
    val again = CurationMain.curate(spark, sf)._1
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val first = curated.select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(first == again)
    assert(funnel.train > funnel.`val` && funnel.train > funnel.test)
  }
}
