package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: media as opaque binary columns with
  * typed metadata, decoded / feature-extracted in distributed batches.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic stub ([[MultimodalStub.decodeStub]]);
  * everything around it — the binary column representation, the typed
  * output schema, partition-wise batched execution via mapPartitions
  * (the Scala equivalent of mapInPandas batches), and the downstream
  * aggregation — is real and tested (LlmOpsSpec).
  *
  * At 100 TB: binary payloads stay columnar in parquet, the decode is
  * a narrow per-partition transform (no shuffle), and only the small
  * typed features flow into joins/aggregations.
  */
object Multimodal {

  /** Typed metadata + features extracted from one media payload. */
  case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    features: Array[Float])

  /** Deterministic STUB for the codec: derives pseudo metadata and an
    * 8-dim feature vector purely from payload length and bytes. A real
    * deployment swaps this body for an actual decoder (JPEG/PNG/PCM…)
    * without touching any of the Spark plumbing around it. */
  object MultimodalStub {
    val FeatureDim = 8

    def decodeStub(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length.toLong
      val checksum = payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) & 0x7fffffffL)
      MediaFeatures(
        doc_id = docId,
        n_bytes = n,
        width = (n % 640).toInt,
        height = (n % 480).toInt,
        n_frames = 1 + (checksum % 16).toInt,
        features = Array.tabulate(FeatureDim)(i => ((checksum + i * 7919) % 97).toFloat / 97f))
    }
  }

  /** The distributed decode pipeline: binary column in, typed features
    * out, batched per partition (narrow transform, no shuffle). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => MultimodalStub.decodeStub(id, bytes) })
  }

  val queries: Map[String, Q] = Map(

    /** Binary-column metadata over documents-as-payloads: the
      * oracle-checkable half of the multimodal surface (byte length +
      * modular pseudo-metadata computed relationally in both engines). */
    "q45_multimodal_meta" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"))
        .select(col("doc_id"), col("n_bytes"),
          pmod(col("n_bytes"), lit(640L)).as("width"),
          pmod(col("n_bytes"), lit(480L)).as("height"))
        .orderBy(col("doc_id"))
    }),

    /** Frame sampling over video-shaped payloads: derive a frame count
      * from the payload metadata, emit every 2nd frame index with a
      * stub per-frame feature — the explode(sequence(...)) shape is
      * exactly how real frame extraction fans out (one row per sampled
      * frame, narrow transform, no shuffle), with the codec stubbed by
      * deterministic arithmetic so the whole fan-out is oracle-checked. */
    "q62_frame_sample" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"))
        .select(col("doc_id"), col("n_bytes"),
          (lit(1L) + pmod(col("n_bytes"), lit(16L))).as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          explode(expr("sequence(0L, n_frames - 1, 2L)")).as("frame_idx"))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          round(pmod(col("doc_id") * (col("frame_idx") + 1), lit(97L)) / 97.0, 6)
            .as("frame_feature"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    /** The full stubbed decode pipeline as a query: mapPartitions
      * batch decode → per-width aggregation of feature norms. Stub is
      * deterministic, so this is oracle-checkable too (the oracle
      * reproduces the stub arithmetic relationally). */
    "q46_multimodal_features" -> ((s: SparkSession, dir: String) => {
      val media = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      extractFeatures(s, media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("n_frames").cast("long").as("n_frames"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q45_multimodal_meta" ->
      """SELECT doc_id, octet_length(cast(text AS BLOB)) AS n_bytes,
        |octet_length(cast(text AS BLOB)) % 640 AS width,
        |octet_length(cast(text AS BLOB)) % 480 AS height
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q62_frame_sample" ->
      """SELECT doc_id, n_frames, i AS frame_idx,
        |round((doc_id * (i + 1)) % 97 / 97.0, 6) AS frame_feature
        |FROM (SELECT doc_id,
        |      1 + octet_length(cast(text AS BLOB)) % 16 AS n_frames
        |      FROM documents),
        |unnest(generate_series(0, n_frames - 1, 2)) AS g(i)
        |ORDER BY doc_id NULLS FIRST, frame_idx NULLS FIRST""".stripMargin,

    // the stub checksum (acc*31 + byte mod 2^31 over UTF-8 bytes —
    // ASCII corpus, so codepoints ≡ bytes) is replicated with a
    // list_reduce fold; f0 reproduces the float32 division exactly via
    // REAL casts before the double round
    "q46_multimodal_features" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), x -> CAST(ord(x) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 2147483648) AS checksum
        |  FROM documents)
        |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
        |CAST(1 + checksum % 16 AS BIGINT) AS n_frames,
        |round(CAST(CAST(checksum % 97 AS REAL) / CAST(97 AS REAL) AS DOUBLE), 6) AS f0
        |FROM f
        |ORDER BY doc_id NULLS FIRST""".stripMargin
  )
}
