package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables, r6, r2n, r4n, r6n}

/** Multimodal-column plumbing: media as opaque binary columns with
  * typed metadata, decoded / feature-extracted in distributed batches.
  *
  * The fixture corpus has no media files, so each query first
  * SYNTHESIZES a structurally valid container — a PNG whose IHDR
  * carries real big-endian dimensions, a canonical 44-byte PCM WAV
  * header with little-endian rate/channels/width — around the document
  * text as payload body, then PARSES the fields back from raw bytes:
  * signature verification, fixed-offset slicing, endian reassembly.
  * Both directions are genuine byte-level work (binary `substring` +
  * `hex`/`unhex`/`conv` stay inside whole-stage codegen; the batched
  * `mapPartitions` path reads the same headers with a big-endian
  * ByteBuffer). The DuckDB oracle recomputes the GROUND-TRUTH
  * arithmetic the headers were built from, so any misread offset or
  * endianness mistake fails the round-trip hash check.
  *
  * At 100 TB: binary payloads stay columnar in parquet, the
  * synth/parse is a narrow per-row transform (no shuffle), and only
  * the small typed features flow into joins/aggregations. A real
  * deployment replaces the body checksum features with an actual
  * pixel/PCM decode inside the same mapPartitions batch loop — the
  * header parsing below is already the real thing.
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

  // ---- byte-assembly helpers (Column-level, codegen-friendly) ----

  /** n-byte BIG-endian encoding of an integral column. */
  private def be(c: Column, n: Int): Column =
    unhex(lpad(hex(c.cast("long")), n * 2, "0"))

  /** n-byte LITTLE-endian encoding of an integral column. */
  private def le(c: Column, n: Int): Column =
    concat((0 until n).map(i =>
      unhex(lpad(hex(pmod(shiftright(c.cast("long"), 8 * i), lit(256))), 2, "0"))): _*)

  /** Big-endian unsigned int read of `len` bytes at 1-based `pos`. */
  private def beRead(payload: Column, pos: Int, len: Int): Column =
    conv(hex(substring(payload, pos, len)), 16, 10).cast("long")

  /** Little-endian read: reassemble the slice byte-reversed, then as BE. */
  private def leRead(payload: Column, pos: Int, len: Int): Column =
    conv(hex(concat((len - 1 to 0 by -1).map(i =>
      substring(payload, pos + i, 1)): _*)), 16, 10).cast("long")

  private val PngSigHex = "89504E470D0A1A0A"
  private val IhdrHex = "49484452" // "IHDR"

  /** The PNG container as a Column — 8-byte signature, IHDR
    * length(13)/type/width/height/bit-depth 8/truecolor/zip/adaptive/
    * no-interlace — with the text as body. CRC bytes are zeroed
    * (parsers below do not verify integrity, as codecs configured for
    * metadata-only reads do not). width/height ground truth:
    * 1 + doc_id mod 1920, 1 + n_chars mod 1080. */
  private def pngPayload: Column =
    concat(
      unhex(lit(PngSigHex)),
      unhex(lit("0000000D")), // IHDR data length = 13
      unhex(lit(IhdrHex)),
      be(lit(1) + pmod(col("doc_id"), lit(1920)), 4),
      be(lit(1) + pmod(col("n_chars"), lit(1080)), 4),
      unhex(lit("0802000000")), // depth 8, truecolor, deflate, adaptive, none
      unhex(lit("00000000")), // CRC (unverified)
      col("text").cast("binary"))

  /** documents → (doc_id, payload): a structurally valid PNG. */
  def synthesizePng(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), pngPayload.as("payload"))

  /** The JPEG container as a Column: SOI, an APP1/EXIF segment whose
    * TIFF IFD carries orientation = 1 + doc_id mod 8 (big-endian "MM"
    * byte order, IFD offset 8, one tag-0x0112 SHORT entry), a
    * VARIABLE number (doc_id mod 3) of junk APPn segments of variable
    * length — so the SOF offset is data-dependent and a fixed-offset
    * "parse" cannot fake the marker walk — then SOF0 with precision 8,
    * ground-truth height/width (same arithmetic as the PNG), 3
    * components, and SOS + text body + EOI. */
  private def jpegPayload: Column = {
    def junk(i: Int, markerHex: String): Column = {
      val len = lit(6L) + pmod(col("doc_id") + lit(i.toLong), lit(7L))
      when(pmod(col("doc_id"), lit(3)) > i,
        concat(unhex(lit(markerHex)), be(len + 2L, 2),
          unhex(repeat(lit("00"), (len).cast("int")))))
        .otherwise(lit(Array.empty[Byte]))
    }
    concat(
      unhex(lit("FFD8")), // SOI
      // APP1 len 0x22: Exif\0\0 + TIFF(MM, 42, IFD@8) + 1 entry:
      // tag 0x0112 (orientation), type 3 (SHORT), count 1, value
      // in the first two value bytes, then next-IFD = 0
      unhex(lit("FFE10022")),
      unhex(lit("457869660000")), // "Exif\0\0"
      unhex(lit("4D4D002A00000008")),
      unhex(lit("0001")), unhex(lit("0112")), unhex(lit("0003")),
      unhex(lit("00000001")),
      be(lit(1) + pmod(col("doc_id"), lit(8)), 2),
      unhex(lit("0000")), unhex(lit("00000000")),
      junk(0, "FFE2"), junk(1, "FFE3"),
      // SOF0: len 0x11, precision 8, height, width, 3 components
      unhex(lit("FFC00011")), unhex(lit("08")),
      be(lit(1) + pmod(col("n_chars"), lit(1080)), 2),
      be(lit(1) + pmod(col("doc_id"), lit(1920)), 2),
      unhex(lit("03")), unhex(lit("011100021100031100")),
      unhex(lit("FFDA")), col("text").cast("binary"), unhex(lit("FFD9")))
  }

  /** documents → (doc_id, payload): a MIXED media column — even
    * doc_ids are PNG, odd are JPEG, and every 17th payload is
    * truncated to 10 bytes (the corrupt-crawl stand-in the lenient
    * parsers must quarantine, not crash on). */
  def synthesizeMixedMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(17)) === 0,
          substring(when(pmod(col("doc_id"), lit(2)) === 0, pngPayload)
            .otherwise(jpegPayload), 1, 10))
        .otherwise(when(pmod(col("doc_id"), lit(2)) === 0, pngPayload)
          .otherwise(jpegPayload)).as("payload"))

  /** documents → one PNG and one JPEG encoding of the SAME body per
    * doc (media_id = 2·doc_id / 2·doc_id+1) — the exact-recompress
    * scenario structural image dedup exists for — with every 17th
    * media row truncated to 10 bytes (quarantine fodder). */
  def synthesizeImagePairs(docs: DataFrame): DataFrame = {
    val png = docs.select(col("doc_id"),
      (col("doc_id") * 2).as("media_id"), pngPayload.as("payload"))
    val jpeg = docs.select(col("doc_id"),
      (col("doc_id") * 2 + 1).as("media_id"), jpegPayload.as("payload"))
    png.unionByName(jpeg)
      .withColumn("payload",
        when(pmod(col("media_id"), lit(17)) === 0, substring(col("payload"), 1, 10))
          .otherwise(col("payload")))
  }

  /** documents → (doc_id, payload): a structurally valid MP4
    * (ISO-BMFF) container — `ftyp` with an alternating major brand, a
    * VARIABLE number (doc_id mod 3) of variable-length `free` boxes
    * (so the moov offset is data-dependent and only an honest box
    * walk finds it), a `moov` holding a full 108-byte version-0
    * `mvhd` whose timescale/duration carry the ground truth, then
    * `mdat` with the text as media body. Every 17th payload is
    * truncated to 6 bytes (quarantine fodder). Ground truth:
    * timescale = 600 + 10·(doc_id mod 90), duration = 25·n_chars. */
  def synthesizeMp4(docs: DataFrame): DataFrame = {
    def box(typ: String, body: Column*): Column = {
      val b = concat(body: _*)
      concat(be(length(b).cast("long") + 8L, 4), lit(typ).cast("binary"), b)
    }
    def junk(i: Int): Column =
      when(pmod(col("doc_id"), lit(3)) > i,
        box("free", unhex(repeat(lit("00"),
          (pmod(col("doc_id") + lit(i.toLong), lit(7L))).cast("int")))))
        .otherwise(lit(Array.empty[Byte]))
    val timescale = lit(600L) + lit(10L) * pmod(col("doc_id"), lit(90L))
    val duration = lit(25L) * col("n_chars")
    val mvhd = box("mvhd",
      unhex(lit("00000000")), // version 0 + flags
      unhex(lit("0000000000000000")), // ctime + mtime
      be(timescale, 4),
      be(duration, 4),
      unhex(lit("00010000")), // rate 1.0
      unhex(lit("0100")), // volume 1.0
      unhex(repeat(lit("00"), lit(70))), // reserved+matrix+predefined
      be(lit(2L), 4)) // next track id
    val payload = concat(
      box("ftyp",
        when(pmod(col("doc_id"), lit(2)) === 0, lit("isom"))
          .otherwise(lit("mp42")).cast("binary"),
        unhex(lit("00000200"))),
      junk(0), junk(1),
      box("moov", mvhd),
      box("mdat", col("text").cast("binary")))
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(17)) === 0, substring(payload, 1, 6))
        .otherwise(payload).as("payload"))
  }

  /** ISO-BMFF box walk as a bounded fold: from offset 1, hop
    * `o → o + size(o)` (size = big-endian 4 bytes at the box start)
    * until the 4-byte type at o+4 matches `typeHex` (fixed point) or
    * the payload runs out (NULL → quarantine). 8 hops bounds this
    * synthesis; a real corpus sizes it to the top-level box budget. */
  private def boxWalk(typeHex: String): Column = expr(
    s"""aggregate(sequence(1, 8), CAST(1 AS BIGINT), (o, i) -> CASE
       |  WHEN o IS NULL OR length(payload) < o + 7 THEN CAST(NULL AS BIGINT)
       |  WHEN hex(substr(payload, CAST(o AS INT) + 4, 4)) = '$typeHex' THEN o
       |  ELSE o +
       |    CAST(conv(hex(substr(payload, CAST(o AS INT), 4)), 16, 10) AS BIGINT)
       |  END)""".stripMargin)

  /** The q169 parser over any (doc_id, payload) frame: box-walk to
    * `moov`, verify `mvhd` inside the parsed offset, read
    * timescale/duration, walk to `mdat` for the body size. Lenient:
    * any structural failure — truncation, a size-0 box pinning the
    * walk, a missing or misplaced mvhd — quarantines the row. */
  def parseMp4(payloads: DataFrame): DataFrame = {
    val p = col("payload")
    val parsed = payloads
      .withColumn("moov", boxWalk("6D6F6F76"))
      .withColumn("mdat", boxWalk("6D646174"))
    val ftypOk = length(p) >= 16 && hex(substring(p, 5, 4)) === "66747970"
    // the walk's 8-hop bound can end ON a non-matching offset (a
    // size-0 box pins it) — re-verify the type AT the result offset
    val moovOk = col("moov").isNotNull && length(p) >= col("moov") + 35 &&
      hex(p.substr((col("moov") + 4).cast("int"), lit(4))) === "6D6F6F76" &&
      hex(p.substr((col("moov") + 12).cast("int"), lit(4))) === "6D766864" &&
      beReadAt(col("moov") + 16, 1) === 0 // mvhd version 0
    val mdatOk = col("mdat").isNotNull &&
      hex(p.substr((col("mdat") + 4).cast("int"), lit(4))) === "6D646174"
    val ok = ftypOk && moovOk && mdatOk
    parsed.select(col("doc_id"),
        when(ok, "mp4").otherwise("quarantined").as("format"),
        when(ok, substring(p, 9, 4).cast("string")).as("brand"),
        when(ok, beReadAt(col("moov") + 28, 4)).as("timescale"),
        when(ok, beReadAt(col("moov") + 32, 4)).as("duration"),
        when(ok, beReadAt(col("moov") + 28, 4)).as("ts2"),
        when(ok, beReadAt(col("mdat"), 4) - 8L).as("media_bytes"))
      .withColumn("duration_ms", expr("1000 * duration DIV ts2"))
      .drop("ts2")
  }

  /** JPEG segment walk as a bounded fold: from the first segment after
    * SOI (1-based offset 3), hop `o → o + 2 + len(o)` until a marker
    * in `markersHex` is hit (fixed point) or the payload runs out
    * (NULL, which the caller quarantines). 8 hops bounds any header
    * this synthesis emits; a real corpus would size it to the APPn
    * budget. Entirely relational: substr on binary + hex + conv. */
  private def segWalk(markersHex: Seq[String]): Column = expr(
    s"""aggregate(sequence(1, 8), CAST(3 AS BIGINT), (o, i) -> CASE
       |  WHEN o IS NULL OR length(payload) < o + 3 THEN CAST(NULL AS BIGINT)
       |  WHEN hex(substr(payload, CAST(o AS INT), 2))
       |    IN (${markersHex.map("'" + _ + "'").mkString(", ")}) THEN o
       |  ELSE o + 2 +
       |    CAST(conv(hex(substr(payload, CAST(o AS INT) + 2, 2)), 16, 10) AS BIGINT)
       |  END)""".stripMargin)

  /** Big-endian read of `len` bytes at a COLUMN offset (1-based). */
  private def beReadAt(pos: Column, len: Int): Column =
    conv(hex(col("payload").substr(pos.cast("int"), lit(len))), 16, 10).cast("long")

  /** documents → (doc_id, payload): canonical 44-byte PCM WAV header
    * (RIFF little-endian) + text as sample data. Ground truth:
    * sample_rate = 8000 + 100·(doc_id mod 81), channels =
    * 1 + doc_id mod 2, 16-bit samples. */
  def synthesizeWav(docs: DataFrame): DataFrame = {
    val dataSize = length(col("text").cast("binary")).cast("long")
    val rate = lit(8000L) + lit(100L) * pmod(col("doc_id"), lit(81L))
    val channels = lit(1L) + pmod(col("doc_id"), lit(2L))
    val bits = lit(16L)
    val blockAlign = channels * bits / lit(8L)
    docs.select(col("doc_id"),
      concat(
        lit("RIFF").cast("binary"),
        le(lit(36L) + dataSize, 4),
        lit("WAVE").cast("binary"),
        lit("fmt ").cast("binary"),
        le(lit(16L), 4), // fmt chunk size
        le(lit(1L), 2), // PCM
        le(channels, 2),
        le(rate, 4),
        le(rate * blockAlign, 4), // byte rate
        le(blockAlign, 2),
        le(bits, 2),
        lit("data").cast("binary"),
        le(dataSize, 4),
        col("text").cast("binary")).as("payload"))
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val PngHeaderLen = 33

  /** The real decode kernel for the batched path: verifies the PNG
    * signature + IHDR tag, reads width/height as big-endian ints at
    * their fixed offsets, and derives body features (checksum fold —
    * the stand-in for pixel decoding, which the container lacks
    * codecs for). Throws on a malformed payload: silent fallback
    * would mask offset bugs. */
  def decodePng(docId: Long, payload: Array[Byte]): MediaFeatures = {
    require(payload.length >= PngHeaderLen &&
      PngSig.indices.forall(i => payload(i) == PngSig(i)),
      s"doc $docId: not a PNG payload")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    require(bb.getInt(12) == 0x49484452, s"doc $docId: first chunk is not IHDR")
    val width = bb.getInt(16)
    val height = bb.getInt(20)
    var checksum = 0L
    var i = PngHeaderLen
    while (i < payload.length) {
      checksum = (checksum * 31 + (payload(i) & 0xff)) & 0x7fffffffL
      i += 1
    }
    MediaFeatures(
      doc_id = docId,
      n_bytes = payload.length.toLong,
      width = width,
      height = height,
      n_frames = 1 + (checksum % 16).toInt,
      features = Array.tabulate(FeatureDim)(j =>
        ((checksum + j * 7919) % 97).toFloat / 97f))
  }

  val FeatureDim = 8

  /** The distributed decode pipeline: binary column in, typed features
    * out, batched per partition (narrow transform, no shuffle).
    * Strict: a malformed payload throws (the right default while the
    * synthesis and parse are maintained together — silent fallback
    * would mask offset bugs). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodePng(id, bytes) })
  }

  /** One decode attempt: exactly one of `features` / `error` is set. */
  final case class DecodeAttempt(
    doc_id: Long,
    features: Option[MediaFeatures],
    error: Option[String])

  /** Lenient decode for UNTRUSTED corpora: at 100 TB some payloads ARE
    * corrupt, and one poison-pill row must not kill a 1000-executor
    * job. EVERY failure — malformed header, truncated buffer, even a
    * NULL payload cell — becomes a quarantine row (doc_id + reason)
    * instead of a thrown task error. ONE dataset comes back so the
    * decode runs once however the caller splits it (filter on `error`
    * for the dead-letter sink, on `features` for the good path;
    * persist before splitting if both sides materialize separately). */
  def extractFeaturesLenient(spark: SparkSession, media: DataFrame)
      : Dataset[DecodeAttempt] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try DecodeAttempt(id, Some(decodePng(id, bytes)), None)
        catch { case scala.util.control.NonFatal(e) =>
          DecodeAttempt(id, None,
            Some(Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
        }
      })
  }

  val queries: Map[String, Q] = Map(

    /** PNG metadata by byte-level parse: synthesize the container,
      * then read signature / IHDR tag / width / height / bit depth
      * back from raw offsets with binary substring + hex + conv (all
      * codegen'd). The signature and chunk-type filters prove the
      * parse looks at the right bytes; the oracle's arithmetic ground
      * truth proves the endian reassembly. */
    "q45_multimodal_meta" -> ((s: SparkSession, dir: String) => {
      val png = synthesizePng(Tables(s, dir, "documents"))
      png
        .filter(hex(substring(col("payload"), 1, 8)) === lit(PngSigHex))
        .filter(hex(substring(col("payload"), 13, 4)) === lit(IhdrHex))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          beRead(col("payload"), 17, 4).as("width"),
          beRead(col("payload"), 21, 4).as("height"),
          beRead(col("payload"), 25, 1).as("bit_depth"))
        .orderBy(col("doc_id"))
    }),

    /** Frame sampling over video-shaped payloads: derive a frame count
      * from the payload metadata, emit every 2nd frame index with a
      * stub per-frame feature — the explode(sequence(...)) shape is
      * exactly how real frame extraction fans out (one row per sampled
      * frame, narrow transform, no shuffle). */
    "q62_frame_sample" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"))
        .select(col("doc_id"), col("n_bytes"),
          (lit(1L) + pmod(col("n_bytes"), lit(16L))).as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          explode(expr("sequence(0L, n_frames - 1, 2L)")).as("frame_idx"))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          round(pmod(col("doc_id") * (col("frame_idx") + 1), lit(97L)) / 97.0 + 1e-12, 6)
            .as("frame_feature"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    /** The batched decode pipeline as a query: mapPartitions PNG parse
      * (ByteBuffer big-endian header reads + body checksum features)
      * over synthesized payloads. Deterministic, so oracle-checkable:
      * DuckDB reproduces the header arithmetic and the body fold. */
    "q46_multimodal_features" -> ((s: SparkSession, dir: String) => {
      val media = synthesizePng(Tables(s, dir, "documents"))
      extractFeatures(s, media).toDF()
        .select(col("doc_id"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          round(element_at(col("features"), 1).cast("double") + 1e-12, 6).as("f0"))
        .orderBy(col("doc_id"))
    }),

    /** Mixed PNG/JPEG metadata with format DISPATCH and quarantine —
      * the real-corpus shape: one binary column holds several
      * container formats plus corrupt payloads, and the parser must
      * (a) dispatch on the signature bytes, (b) walk JPEG's
      * variable-length segment list to SOF0/SOF2 for
      * height/width/components (the dominant image format's dimension
      * read — fixed offsets do not exist in JPEG), (c) follow the
      * APP1/EXIF TIFF IFD to the orientation tag using the PARSED IFD
      * offset (so two misreads cannot cancel), and (d) quarantine
      * truncated payloads as rows, never task failures. The walk is a
      * bounded aggregate fold over binary substr/hex/conv — narrow,
      * per-row, no shuffle; at 100 TB this runs at scan speed next to
      * the payload bytes. Oracle: the ground-truth arithmetic each
      * header was synthesized from. */
    "q153_image_meta" -> ((s: SparkSession, dir: String) => {
      val p = col("payload")
      val parsed = synthesizeMixedMedia(Tables(s, dir, "documents"))
        .withColumn("sof", segWalk(Seq("FFC0", "FFC2")))
        .withColumn("app1", segWalk(Seq("FFE1")))
        .withColumn("ifd", col("app1") + 10 + beReadAt(col("app1") + 14, 4))
      val pngOk = length(p) >= PngHeaderLen &&
        hex(substring(p, 1, 8)) === PngSigHex &&
        hex(substring(p, 13, 4)) === IhdrHex
      val jpegOk = hex(substring(p, 1, 2)) === "FFD8" &&
        col("sof").isNotNull && length(p) >= col("sof") + 9 &&
        col("app1").isNotNull &&
        hex(p.substr((col("app1") + 4).cast("int"), lit(6))) === "457869660000" &&
        beReadAt(col("ifd") + 2, 2) === 274 // first IFD entry is tag 0x0112
      parsed.select(col("doc_id"),
          when(pngOk, "png").when(jpegOk, "jpeg")
            .otherwise("quarantined").as("format"),
          when(pngOk, beRead(p, 17, 4))
            .when(jpegOk, beReadAt(col("sof") + 7, 2)).as("width"),
          when(pngOk, beRead(p, 21, 4))
            .when(jpegOk, beReadAt(col("sof") + 5, 2)).as("height"),
          when(jpegOk, beReadAt(col("sof") + 9, 1)).as("n_components"),
          // SHORT value sits in the first 2 bytes of the entry's
          // 4-byte value field (big-endian TIFF), entry = ifd + 2
          when(jpegOk, beReadAt(col("ifd") + 2 + 8, 2)).as("orientation"))
        .orderBy(col("doc_id"))
    }),

    /** STRUCTURAL image near-dup — the perceptual-dedup stand-in for a
      * corpus whose containers differ but whose content does not (the
      * exact-recompress case: the same image saved as both PNG and
      * JPEG has no shared container bytes, so content-hash dedup à la
      * q33 sees two distinct files). The structural signature samples
      * 64 BODY bytes at evenly spaced offsets — the byte-domain
      * analogue of an 8×8 downsample — AFTER parsing each container
      * to its body (PNG: fixed 33-byte header; JPEG: segment walk to
      * SOS, body runs to EOI), so the signature is container-
      * invariant by construction. Truncated payloads quarantine out.
      * Everything is per-row projection except the final signature
      * groupBy, whose key is a 32-byte hash. Oracle: DuckDB rebuilds
      * the same 64-point sample from the ground-truth body text and
      * must land on identical sha-256 groups. */
    "q154_image_neardup" -> ((s: SparkSession, dir: String) => {
      val p = col("payload")
      // PLAN-SIZE BARRIERS (round-17, guide §4.4/§7.3): payload is a
      // ~500-node synthesis expression, sos an 8-step fold over it,
      // body a CASE over both — and the optimizer inlined each alias
      // into every downstream reference (the filter, fmt, and the
      // 64-sample signature), compounding to a 218 KB physical plan
      // whose per-execution ANALYSIS cost ~1.2 s of driver time
      // against 1.2 s of executor jobs. An identity UDF marked
      // non-deterministic pins each tier to ONE evaluation (the
      // optimizer may not duplicate or reorder it — the same lever
      // the guide applies to expensive Python UDFs), so downstream
      // expressions reference plain attributes. Values are untouched
      // and the oracle pins the output.
      val idb = udf((b: Array[Byte]) => b).asNondeterministic()
      val parsed = synthesizeImagePairs(Tables(s, dir, "documents"))
        .select(col("media_id"), idb(col("payload")).as("payload"))
        .withColumn("sos", segWalk(Seq("FFDA")))
      val pngOk = length(p) >= PngHeaderLen &&
        hex(substring(p, 1, 8)) === PngSigHex &&
        hex(substring(p, 13, 4)) === IhdrHex
      val jpegOk = hex(substring(p, 1, 2)) === "FFD8" &&
        col("sos").isNotNull && length(p) >= col("sos") + 3
      val withBody = parsed.select(col("media_id"),
        idb(when(pngOk, p.substr(lit(34), (length(p) - 33).cast("int")))
          .when(jpegOk, p.substr((col("sos") + 2).cast("int"),
            (length(p) - col("sos") - 3).cast("int"))))
          .as("body"),
        when(pngOk, "png").when(jpegOk, "jpeg").as("fmt"))
        .filter(col("body").isNotNull)
      // the 64 sample positions as ONE fold referencing `body` twice,
      // not 64 times (round-17, guide §7.3): `body` is itself the
      // payload-synthesis CASE, and the old 64-branch concat inlined
      // that subtree per branch — a 218 KB physical plan whose
      // analysis cost ~1.2 s of DRIVER time per execution (wall 2.4 s
      // vs 1.2 s of executor jobs). Identical bytes: same position
      // arithmetic (double multiply, floor, int cast, greatest), same
      // substr, same left-to-right concat order, so the sha2 is
      // bit-equal and the oracle is unchanged.
      val sig = sha2(expr(
        """aggregate(sequence(0, 63), CAST('' AS BINARY), (acc, i) ->
          |  concat(acc, substr(body,
          |    greatest(1, CAST(1 + floor(CAST(i AS DOUBLE) * (length(body) - 1)
          |      / 63.0D) AS INT)), 1)))""".stripMargin), 256)
      withBody.select(col("media_id"), col("fmt"), sig.as("sg"))
        .groupBy(col("sg"))
        .agg(count(lit(1)).as("n_media"),
          countDistinct(col("fmt")).as("n_formats"))
        .filter(col("n_media") >= 2)
        .select(substring(col("sg"), 1, 16).as("sig_prefix"),
          col("n_media"), col("n_formats"))
        .orderBy(col("sig_prefix"))
    }),

    /** Audio FEATURE extraction over the PCM stream — the DSP step
      * after q105's header parse: decode the data chunk as int16
      * little-endian samples (each sample reassembled from its two
      * bytes inside a transform lambda — byte offsets derive from the
      * PARSED data-size field, so a header misread corrupts the
      * features and fails the oracle), then RMS energy, peak
      * amplitude, and the mean-crossing rate (sign changes around the
      * stream mean — the DC-offset-robust zero-crossing analogue),
      * all as HOF folds over the per-row sample array. Narrow,
      * per-row, no shuffle: at 100 TB this runs at scan speed next to
      * the payload bytes, exactly where a real PCM feature pass
      * (loudness screens, silence trimming) runs. Integer sample
      * squares sum exactly in doubles, and the mean fold is
      * sequential, so every feature is engine-exact. */
    "q159_audio_features" -> ((s: SparkSession, dir: String) => {
      val wav = synthesizeWav(Tables(s, dir, "documents"))
      val p = col("payload")
      val n16 = (leRead(p, 41, 4) / 2L).cast("long")
      val smp = expr(
        """transform(sequence(1, CAST(n16 AS INT)), i ->
          |  CAST(conv(hex(substr(payload, 43 + 2 * i, 1)), 16, 10) AS INT)
          |  + 256 * CAST(conv(hex(substr(payload, 44 + 2 * i, 1)), 16, 10) AS INT))"""
          .stripMargin)
      val signed = expr("transform(smp_u, u -> u - 65536 * CAST(u >= 32768 AS INT))")
      val base = wav
        .filter(substring(p, 1, 4).cast("string") === "RIFF" &&
          substring(p, 37, 4).cast("string") === "data")
        .select(col("doc_id"), col("payload"), n16.as("n16"))
        .select(col("doc_id"), col("n16"), smp.as("smp_u"))
        .select(col("doc_id"), col("n16"), signed.as("smp"))
      val sumSq = expr(
        "aggregate(smp, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * x)")
      val mean = expr(
        "aggregate(smp, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / size(smp)")
      base
        .select(col("doc_id"), col("n16").as("n_samples"),
          r6n(sqrt(sumSq / col("n16"))).as("rms"),
          expr("array_max(transform(smp, x -> abs(x)))").cast("long").as("peak"),
          mean.as("m"), col("smp"))
        .select(col("doc_id"), col("n_samples"), col("rms"), col("peak"),
          when(col("n_samples") >= 2, expr(
            """size(filter(sequence(2, CAST(n_samples AS INT)), i ->
              |  (element_at(smp, i - 1) < m) != (element_at(smp, i) < m)))"""
              .stripMargin)).otherwise(lit(0)).cast("long").as("mean_crossings"))
        .orderBy(col("doc_id"))
    }),

    /** VIDEO container metadata — the MP4 (ISO-BMFF) box walk that
      * completes the image (q153) / audio (q105, q159) / video triad.
      * The parser hops top-level boxes by their big-endian size fields
      * to `moov` (the offset is data-dependent — junk `free` boxes sit
      * in front of it), verifies the `mvhd` header INSIDE the parsed
      * moov offset (two misreads cannot cancel), reads
      * timescale/duration big-endian, and walks separately to `mdat`
      * for the media body size. duration_ms is integer floor division
      * on both engines — no float boundary to flip. Truncated payloads
      * quarantine as rows. Narrow per-row projection, no shuffle: at
      * 100 TB this is the scan-speed metadata pass a video-corpus
      * curator runs before any frame decode. Oracle: the ground-truth
      * arithmetic the headers were synthesized from. */
    "q169_video_meta" -> ((s: SparkSession, dir: String) =>
      parseMp4(synthesizeMp4(Tables(s, dir, "documents")))
        .orderBy(col("doc_id"))),

    /** VIDEO frame sampling — the "every Nth frame" feature pass a
      * video curator runs before any ML scoring, over the q169
      * containers: parse to the `mdat` body, treat it as fixed-64-byte
      * frames, sample at a stride targeting ~4 frames per clip, and
      * fingerprint each sampled frame (sha-256). The scene-change
      * proxy (distinct sampled fingerprints) and the first-frame
      * signature come out of ONE per-row higher-order projection —
      * sequence → transform → array_distinct — with no explode, no
      * shuffle, no state: at 100 TB the pass runs at scan speed and
      * only the tiny per-clip features ever leave the row. A real
      * deployment swaps the sha fingerprint for a decoded-frame
      * embedding inside the same lambda shape. */
    "q170_frame_sample" -> ((s: SparkSession, dir: String) => {
      val p = col("payload")
      val parsed = synthesizeMp4(Tables(s, dir, "documents"))
        .withColumn("mdat", boxWalk("6D646174"))
      val ok = col("mdat").isNotNull && length(p) >= col("mdat") + 8
      parsed.filter(ok)
        .select(col("doc_id"),
          p.substr((col("mdat") + 8).cast("int"),
            (beReadAt(col("mdat"), 4) - 8).cast("int")).as("body"))
        .withColumn("n_frames", expr("CAST((length(body) + 63) DIV 64 AS BIGINT)"))
        .withColumn("sigs", expr(
          """transform(
            |  sequence(0L, n_frames - 1, greatest(1L, n_frames DIV 4)),
            |  i -> sha2(substr(body, CAST(1 + 64 * i AS INT), 64), 256))"""
            .stripMargin))
        .select(col("doc_id"), col("n_frames"),
          size(col("sigs")).cast("long").as("n_sampled"),
          size(array_distinct(col("sigs"))).cast("long").as("n_distinct_frames"),
          substring(element_at(col("sigs"), 1), 1, 16).as("first_sig"))
        .orderBy(col("doc_id"))
    }),

    /** WAV (RIFF) metadata by little-endian byte parse: synthesize the
      * canonical 44-byte PCM header, verify the RIFF/WAVE/data tags,
      * then reassemble sample-rate / channels / bit-width / data size
      * from their little-endian slices. n_samples divides the parsed
      * data size by the parsed block align — two misparses cannot
      * cancel. */
    "q105_wav_meta" -> ((s: SparkSession, dir: String) => {
      val wav = synthesizeWav(Tables(s, dir, "documents"))
      val p = col("payload")
      wav
        .filter(substring(p, 1, 4).cast("string") === "RIFF")
        .filter(substring(p, 9, 4).cast("string") === "WAVE")
        .filter(substring(p, 37, 4).cast("string") === "data")
        .select(col("doc_id"),
          leRead(p, 25, 4).as("sample_rate"),
          leRead(p, 23, 2).as("channels"),
          leRead(p, 35, 2).as("bits"),
          leRead(p, 41, 4).as("data_bytes"),
          (leRead(p, 41, 4) / (leRead(p, 23, 2) * leRead(p, 35, 2) / lit(8L)))
            .cast("long").as("n_samples"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    // ground-truth arithmetic the PNG header was synthesized from;
    // payload = 33 header bytes + text body
    "q45_multimodal_meta" ->
      """SELECT doc_id,
        |33 + octet_length(cast(text AS BLOB)) AS n_bytes,
        |1 + doc_id % 1920 AS width,
        |1 + n_chars % 1080 AS height,
        |CAST(8 AS BIGINT) AS bit_depth
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q62_frame_sample" ->
      """SELECT doc_id, n_frames, i AS frame_idx,
        |round((doc_id * (i + 1)) % 97 / 97.0 + 1e-12, 6) AS frame_feature
        |FROM (SELECT doc_id,
        |      1 + octet_length(cast(text AS BLOB)) % 16 AS n_frames
        |      FROM documents),
        |unnest(generate_series(0, n_frames - 1, 2)) AS g(i)
        |ORDER BY doc_id NULLS FIRST, frame_idx NULLS FIRST""".stripMargin,

    // header fields from ground-truth arithmetic; body checksum
    // (acc*31 + byte mod 2^31 over the text bytes — ASCII corpus, so
    // codepoints ≡ bytes) replicated with a list_reduce fold; f0
    // reproduces the float32 division exactly via REAL casts
    "q46_multimodal_features" ->
      """WITH f AS (
        |  SELECT doc_id,
        |  33 + octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  1 + doc_id % 1920 AS width,
        |  1 + n_chars % 1080 AS height,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), x -> CAST(ord(x) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 2147483648) AS checksum
        |  FROM documents)
        |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
        |CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
        |CAST(1 + checksum % 16 AS BIGINT) AS n_frames,
        |round(CAST(CAST(checksum % 97 AS REAL) / CAST(97 AS REAL) AS DOUBLE) + 1e-12, 6) AS f0
        |FROM f
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    // mixed-media ground truth: even doc_ids PNG, odd JPEG, every
    // 17th truncated to 10 bytes -> quarantined with NULL fields;
    // JPEG carries 3 components and orientation 1 + doc_id % 8
    "q153_image_meta" ->
      """SELECT doc_id,
        |CASE WHEN doc_id % 17 = 0 THEN 'quarantined'
        |     WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |CASE WHEN doc_id % 17 = 0 THEN NULL
        |     ELSE 1 + doc_id % 1920 END AS width,
        |CASE WHEN doc_id % 17 = 0 THEN NULL
        |     ELSE 1 + n_chars % 1080 END AS height,
        |CASE WHEN doc_id % 17 = 0 OR doc_id % 2 = 0 THEN NULL
        |     ELSE CAST(3 AS BIGINT) END AS n_components,
        |CASE WHEN doc_id % 17 = 0 OR doc_id % 2 = 0 THEN NULL
        |     ELSE 1 + doc_id % 8 END AS orientation
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    // structural-signature ground truth: both containers carry the doc
    // text as body, so the 64-point sample rebuilds from text directly;
    // every 17th media row is truncated -> parsed out before grouping
    "q154_image_neardup" ->
      """WITH m AS (
        |  SELECT doc_id, 2 * doc_id AS media_id, 'png' AS fmt, text FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2 * doc_id + 1, 'jpeg', text FROM documents),
        |ok AS (SELECT * FROM m WHERE media_id % 17 <> 0),
        |sig AS (
        |  SELECT media_id, fmt,
        |  sha256(array_to_string(list_transform(generate_series(0, 63),
        |    i -> substr(text,
        |      greatest(1, 1 + CAST(floor(i * (len(text) - 1) / 63.0) AS INT)),
        |      1)), '')) AS sg
        |  FROM ok)
        |SELECT substr(sg, 1, 16) AS sig_prefix,
        |CAST(count(*) AS BIGINT) AS n_media,
        |CAST(count(DISTINCT fmt) AS BIGINT) AS n_formats
        |FROM sig GROUP BY sg HAVING count(*) >= 2
        |ORDER BY sig_prefix NULLS FIRST""".stripMargin,

    // audio-feature ground truth: the data chunk IS the text bytes, so
    // the int16 stream rebuilds from character pairs; identical
    // sequential folds for mean/energy, so rms and the mean-crossing
    // count are engine-exact
    "q159_audio_features" ->
      """WITH t AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) // 2 AS n16, text
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n16,
        |  list_transform(generate_series(1, CAST(n16 AS INT)),
        |    i -> ord(text[2*i-1]) + 256 * ord(text[2*i])
        |         - 65536 * CAST((ord(text[2*i-1]) + 256 * ord(text[2*i])) >= 32768 AS INT))
        |    AS smp
        |  FROM t),
        |sm AS (
        |  SELECT *, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(smp, x -> CAST(x AS DOUBLE))),
        |    (acc, x) -> acc + x) / n16 AS m
        |  FROM s)
        |SELECT doc_id, CAST(n16 AS BIGINT) AS n_samples,
        |round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(smp, x -> CAST(x AS DOUBLE) * x)),
        |  (acc, x) -> acc + x) / n16) + 1e-12, 6) AS rms,
        |CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak,
        |CAST(CASE WHEN n16 >= 2 THEN
        |  len(list_filter(generate_series(2, CAST(n16 AS INT)),
        |    i -> (smp[i-1] < m) != (smp[i] < m)))
        |  ELSE 0 END AS BIGINT) AS mean_crossings
        |FROM sm
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    // MP4 ground truth: brand alternates by doc_id parity, timescale
    // and duration as synthesized, every 17th truncated -> quarantined;
    // duration_ms is BIGINT floor division in both engines
    "q169_video_meta" ->
      """SELECT doc_id,
        |CASE WHEN doc_id % 17 = 0 THEN 'quarantined' ELSE 'mp4' END AS format,
        |CASE WHEN doc_id % 17 = 0 THEN NULL
        |     WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
        |CASE WHEN doc_id % 17 = 0 THEN NULL
        |     ELSE 600 + 10 * (doc_id % 90) END AS timescale,
        |CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 25 * n_chars END AS duration,
        |CASE WHEN doc_id % 17 = 0 THEN NULL
        |     ELSE octet_length(CAST(text AS BLOB)) END AS media_bytes,
        |CASE WHEN doc_id % 17 = 0 THEN NULL
        |     ELSE (1000 * 25 * n_chars) // (600 + 10 * (doc_id % 90))
        |     END AS duration_ms
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    // frame-sample ground truth: the mdat body IS the text bytes, so
    // frames/stride/fingerprints rebuild from the text directly
    "q170_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id,
        |  (octet_length(CAST(text AS BLOB)) + 63) // 64 AS n_frames, text
        |  FROM documents WHERE doc_id % 17 <> 0),
        |s AS (
        |  SELECT doc_id, n_frames,
        |  list_transform(
        |    generate_series(0, CAST(n_frames - 1 AS INT),
        |      CAST(greatest(1, n_frames // 4) AS INT)),
        |    i -> sha256(substr(text, CAST(1 + 64 * i AS INT), 64))) AS sigs
        |  FROM f)
        |SELECT doc_id, n_frames,
        |CAST(len(sigs) AS BIGINT) AS n_sampled,
        |CAST(len(list_distinct(sigs)) AS BIGINT) AS n_distinct_frames,
        |substr(sigs[1], 1, 16) AS first_sig
        |FROM s
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    // WAV ground truth: rate/channels/bits as synthesized; data bytes
    // = text body; samples = bytes / block align
    "q105_wav_meta" ->
      """SELECT doc_id,
        |8000 + 100 * (doc_id % 81) AS sample_rate,
        |1 + doc_id % 2 AS channels,
        |CAST(16 AS BIGINT) AS bits,
        |octet_length(cast(text AS BLOB)) AS data_bytes,
        |octet_length(cast(text AS BLOB)) // ((1 + doc_id % 2) * 2) AS n_samples
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin
  )
}
