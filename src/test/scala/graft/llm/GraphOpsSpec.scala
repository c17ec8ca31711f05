package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Graph-primitive semantics on CONSTRUCTED graphs — shapes whose
  * exact census is known by hand, which the DuckDB oracle (computing
  * the same joins) cannot independently confirm. */
class GraphOpsSpec extends SparkSuite {

  private def stats(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    TextDedup.triangleStats(edges.toDF("d1", "d2")).collect().head
  }

  test("triangle census: a 4-clique has C(4,3)=4 triangles and cc=1") {
    val clique = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val r = stats(clique)
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_wedges") == 12L) // 4 nodes x C(3,2)
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Double]("global_cc") == 1.0)
  }

  test("triangle census: a path graph has wedges but zero triangles") {
    val r = stats(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("n_wedges") == 2L)
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Double]("global_cc") == 0.0)
  }

  test("triangle census: disjoint triangle + edge counts only the closed wedge set") {
    val r = stats(Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_wedges") == 3L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Double]("global_cc") == 1.0)
  }

  test("q172 over identical documents finds the expected clique structure") {
    // three byte-identical docs form a 3-clique at jaccard 1.0; the
    // census must report exactly one triangle among them
    val docs = graft.Tables(spark, sf, "documents").limit(1)
      .select(col("text")).crossJoin(
        spark.range(3).select((col("id") + 1000L).as("doc_id")))
      .select(col("doc_id"), col("text"))
    val edges = TextDedup.jaccardPairs(docs, 0.5).select(col("d1"), col("d2"))
    val r = TextDedup.triangleStats(edges).collect().head
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Double]("global_cc") == 1.0)
  }
}
