package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Similarity search over the embeddings table (ArrayType(FloatType),
  * 64-dim): brute-force cosine top-k as the exact baseline, a k-NN
  * join, and a random-hyperplane LSH-bucketed variant as the
  * approximate scale path.
  *
  * Scale design:
  *  - query vectors are broadcast — the big side streams once, no
  *    shuffle of the corpus;
  *  - dot products are higher-order-function expressions (zip_with +
  *    aggregate) evaluated inside codegen — no UDF serialization;
  *  - top-k goes through orderBy().limit(k) → TakeOrderedAndProject
  *    (per-partition heaps, driver merges k rows, never a full sort);
  *  - the LSH variant prunes candidates by sign-random-projection
  *    buckets (Charikar SRP); at 100 TB the bucket join replaces the
  *    full scan per query. Cf. PAPERS.md distributed top-k similarity
  *    entries (REPOSE, ICDE 2021).
  */
object Similarity {

  private def r6(c: Column) = round(c, 6)

  /** Sequential-fold cosine between two double-cast float arrays —
    * identical op order to the DuckDB oracle formula, so results match
    * bit-for-bit. Kept as the declarative reference implementation for
    * the custom expression (CosineSimilaritySpec asserts equality). */
  private[graft] def cosineFold(a: String, b: String): Column = {
    def dot(x: String, y: String) = expr(
      s"aggregate(zip_with($x, $y, (p, q) -> cast(p AS double) * cast(q AS double)), 0D, (acc, v) -> acc + v)")
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Hot-path cosine: the codegen'd native expression
    * (graft.functions.CosineSimilarity) — same values, fused loop. */
  private def cosine(a: String, b: String): Column =
    expr(s"cosine_sim($a, $b)")

  private def withCosine(s: SparkSession): Unit =
    graft.functions.VectorFunctions.register(s)

  val queries: Map[String, Q] = Map(

    /** Exact top-20 cosine neighbors of vec_id=0 — brute force, one
      * streaming scan of the corpus against a broadcast query row. */
    "q42_cosine_topk" -> ((s: SparkSession, dir: String) => {
      withCosine(s)
      val e = Tables(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      e.crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), cosine("embedding", "q_emb").as("cs"))
        .orderBy(desc_nulls_last("cs"), asc_nulls_first("vec_id"))
        .limit(20)
        .select(col("vec_id"), r6(col("cs")).as("cos_sim"))
    }),

    /** k-NN join: top-3 neighbors for each of the first 50 vectors.
      * Broadcast the query block; rank per query with a window. At
      * 100 TB the same plan holds with a bucketed candidate join
      * (q44) replacing the broadcast-times-corpus product. */
    "q43_knn_join" -> ((s: SparkSession, dir: String) => {
      withCosine(s)
      val e = Tables(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(desc_nulls_last("cs"), asc_nulls_first("vec_id"))
      e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), cosine("embedding", "q_emb").as("cs"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
          r6(col("cs")).as("cos_sim"))
        .orderBy(col("q_id"), col("rank"))
    }),

    /** Approximate NN via sign-random-projection LSH: 8 deterministic
      * pseudo-random hyperplanes (coefficients derived from xxhash64 of
      * the (plane, dim) index) → 8-bit bucket; neighbors are searched
      * only within the query's bucket. Bucket membership depends on the
      * engine's hash → rows-only check; recall vs the exact q42 is
      * unit-tested in LlmOpsSpec. */
    "q44_ann_lsh" -> ((s: SparkSession, dir: String) => {
      withCosine(s)
      val e = Tables(s, dir, "embeddings")
      // bit p of the bucket = sign of <v, h_p>. The hyperplanes are
      // deterministic pseudo-random constants — computed ONCE on the
      // driver and shipped as array literals, so the per-row work is a
      // pure fused dot product (the first version recomputed a hash per
      // element per row: 512 hashes/row; this is 0).
      def coef(p: Int, d: Int): Double = {
        var h = (p * 64 + d + 1) * 0x9E3779B97F4A7C15L
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        (java.lang.Math.floorMod(h, 2001L) - 1000L) / 1000.0
      }
      val bucketBits = (0 until 8).map { p =>
        val planeSql = (0 until 64).map(d => s"${coef(p, d)}D").mkString("array(", ", ", ")")
        val proj = expr(s"aggregate(zip_with(embedding, $planeSql, (x, c) -> cast(x AS double) * c), 0D, (acc, v) -> acc + v)")
        when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
      }
      val bucketed = e.select(col("vec_id"), col("embedding"),
        bucketBits.reduce((a, b) => a.bitwiseOR(b)).as("bucket"))
      val qv = bucketed.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
      bucketed.join(broadcast(qv), col("bucket") === col("q_bucket"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), cosine("embedding", "q_emb").as("cs"))
        .orderBy(desc_nulls_last("cs"), asc_nulls_first("vec_id"))
        .limit(10)
        .select(col("vec_id"), r6(col("cs")).as("cos_sim"))
    })
  )

  private val duckCosine =
    """list_aggregate(list_transform(generate_series(1, 64),
      |  i -> cast(embedding[i] AS DOUBLE) * cast(q_emb[i] AS DOUBLE)), 'sum')
      |/ sqrt(
      |  list_aggregate(list_transform(generate_series(1, 64),
      |    i -> cast(embedding[i] AS DOUBLE) * cast(embedding[i] AS DOUBLE)), 'sum')
      |  * list_aggregate(list_transform(generate_series(1, 64),
      |    i -> cast(q_emb[i] AS DOUBLE) * cast(q_emb[i] AS DOUBLE)), 'sum'))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q42_cosine_topk" ->
      s"""SELECT vec_id, round(cs, 6) AS cos_sim FROM (
         |  SELECT e.vec_id, $duckCosine AS cs
         |  FROM embeddings e
         |  CROSS JOIN (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
         |  WHERE e.vec_id <> 0)
         |ORDER BY cs DESC NULLS LAST, vec_id NULLS FIRST
         |LIMIT 20""".stripMargin,

    "q43_knn_join" ->
      s"""SELECT q_id, vec_id AS neighbor_id, rank, round(cs, 6) AS cos_sim FROM (
         |  SELECT q_id, vec_id, cs,
         |  cast(row_number() OVER (PARTITION BY q_id ORDER BY cs DESC NULLS LAST, vec_id NULLS FIRST) AS BIGINT) AS rank
         |  FROM (
         |    SELECT q.vec_id AS q_id, e.vec_id, $duckCosine AS cs
         |    FROM embeddings e
         |    CROSS JOIN (SELECT vec_id, embedding AS q_emb FROM embeddings WHERE vec_id < 50) q
         |    WHERE e.vec_id <> q.vec_id))
         |WHERE rank <= 3
         |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
  )
}
