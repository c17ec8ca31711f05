package graft

import org.apache.spark.sql.functions._
import graft.llm.CorpusOps

/** Invariant tests for the corpus-assembly operators (the DuckDB gate
  * checks exact values; these check the semantic contracts that must
  * hold at ANY scale factor). */
class CorpusOpsSpec extends SparkSuite {

  test("q94 packing covers the token stream exactly with no gaps or overlaps") {
    val out = CorpusOps.queries("q94_pack_sequences")(spark, sf)
      .orderBy(col("doc_id")).collect()
    val totalTok = out.map(_.getAs[Long]("n_tok")).sum
    // spans are contiguous: doc i+1 starts in the chunk where doc i
    // ended (or the next one when doc i ended exactly on a boundary)
    var running = 0L
    out.foreach { r =>
      val first = r.getAs[Long]("chunk_first")
      val last = r.getAs[Long]("chunk_last")
      assert(first == running / 512, s"doc ${r.getAs[Long]("doc_id")} first")
      running += r.getAs[Long]("n_tok")
      assert(last == (running - 1) / 512, s"doc ${r.getAs[Long]("doc_id")} last")
      assert(r.getAs[Long]("n_chunks") == last - first + 1)
    }
    assert(running == totalTok)
  }

  test("q95 redaction removes every planted pattern and counts each once") {
    val out = CorpusOps.queries("q95_pii_redact")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_email") == 1L)
      assert(r.getAs[Long]("n_ip") == 1L)
      assert(r.getAs[Long]("n_phone") == 1L)
      // every doc loses at least the digits of the planted PII
      assert(r.getAs[Long]("removed") > 0L)
    }
  }

  test("q95 redaction replaces PII in hand-built text") {
    import spark.implicits._
    // the library regexes, applied exactly as the query applies them
    val df = Seq((1L, "mail bob.smith@corp.example.org ip 192.168.0.1 tel 555-1234 end"))
      .toDF("doc_id", "t")
      .select(regexp_replace(regexp_replace(regexp_replace(col("t"),
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
        "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
        "\\b\\d{3}-\\d{4}\\b", "<PHONE>").as("red"))
    assert(df.head.getString(0) == "mail <EMAIL> ip <IP> tel <PHONE> end")
  }

  test("q96 quota sampling keeps at most 20 per language, deterministically") {
    val out = CorpusOps.queries("q96_stratified_sample")(spark, sf)
    val perLang = out.groupBy("lang").count().collect()
    assert(perLang.forall(_.getAs[Long]("count") <= 20L))
    val again = CorpusOps.queries("q96_stratified_sample")(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty,
      "re-run must produce the identical sample")
  }

  test("q97 incremental dedup equals recomputing exact dedup on the union") {
    val docs = Tables(spark, sf, "documents")
    val out = CorpusOps.queries("q97_incremental_dedup")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // reference semantics: batch doc survives iff no corpus doc shares
    // its text
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text")).collect()
    val corpusTexts = docs.filter(col("doc_id") % 10 =!= 0)
      .select("text").collect().map(_.getString(0)).toSet
    val expected = batch.filter(r => !corpusTexts.contains(r.getString(1)))
      .map(_.getLong(0)).toSet
    assert(out == expected)
  }

  test("q98 upsampling emits exactly weight copies per doc") {
    val out = CorpusOps.queries("q98_mixture_upsample")(spark, sf)
    val perDoc = out.groupBy("doc_id", "weight")
      .agg(count(lit(1)).as("n"), max(col("copy_ix")).as("mx"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Long]("weight"))
      assert(r.getAs[Long]("mx") == r.getAs[Long]("weight"))
    }
  }

  test("q247 compaction plan conserves bytes and packs contiguous files") {
    val out = CorpusOps.queries("q247_compaction_plan")(spark, sf).collect()
    val docs = Tables(spark, sf, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("bytes"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("bytes"))).toMap
    val bySource = out.groupBy(_.getString(0))
    assert(bySource.keySet == docs.keySet)
    bySource.foreach { case (src, rows) =>
      // conservation: every doc lands in exactly one file
      assert(rows.map(_.getAs[Long]("n_docs")).sum == docs(src)._1)
      assert(rows.map(_.getAs[Long]("bytes")).sum == docs(src)._2)
      // contiguity: file ids are 0..k-1 with no gaps
      val ids = rows.map(_.getAs[Long]("file_id")).sorted.toSeq
      assert(ids == (0L until ids.length.toLong),
        s"file ids not contiguous for $src: ${ids.mkString(",")}")
      // start-offset packing invariant: the next file's first doc
      // starts at offset >= (b+1)*target, so the prefix byte sum
      // through every NON-final file b must reach (b+1)*target
      val byId = rows.sortBy(_.getAs[Long]("file_id"))
      byId.init.zipWithIndex.foldLeft(0L) { case (acc, (f, b)) =>
        val cum = acc + f.getAs[Long]("bytes")
        assert(cum >= (b + 1L) * 65536L,
          s"file $b of $src closed early: prefix bytes $cum < ${(b + 1) * 65536}")
        cum
      }
    }
  }
}
