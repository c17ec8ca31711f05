package graft

import org.apache.spark.sql.functions._

/** Direct DATA-TERM volume counts for scaling probes whose wall-time
  * exponent disagrees with their plan-structural argument — the
  * rep_pair_seed playbook (round 11): measure the join volume itself
  * at every scale; if it is exactly linear, the wall residual is a
  * runtime constant-factor (GC, spill, fixed parallelism), not a plan
  * term, and the record can say so with a count instead of an
  * argument.
  *
  * Covers q244's wedge volume (the capped a-w-b join) and its edge
  * volume; round 14 adds the two new mildly-super-linear ×100
  * readings: q218's join volume (lineitem⋈orders rows — the cached
  * latency table the quantile rank pass sorts) and q413's
  * duplicated-site and run-row volumes (the streak window's input and
  * the fetch-back's probe side). Round 16 adds q421 (the run-store
  * compact — the board's most expensive entry, and the only ≥ 1.0
  * ×100 exponent without a data-term pin per the round-15 verdict):
  * the rows the watermark fold and the postings/docs rewrites
  * actually process.
  *
  *   sbt "runMain graft.VolumeCheck [baseDir] [scales] [checks]"
  *   checks: comma list of q244,q218,q413,q421 (default all)
  */
object VolumeCheck {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local("graft-volume")
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 30, 100)
    val checks = if (args.length > 2) args(2).split(",").toSet
      else Set("q244", "q218", "q413", "q421")
    scales.foreach { sc =>
      val dir = ScaleStress.synthesize(s, base, sc)
      if (checks("q218")) {
        val n = s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"))
          .join(s.read.parquet(s"$dir/orders.parquet")
            .select(col("o_orderkey")),
            col("o_orderkey") === col("l_orderkey")).count()
        println(s"[vol] q218 x$sc join_rows=$n")
      }
      if (checks("q413")) {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
        val pos = docs.select(col("doc_id"), expr(
          """posexplode(transform(sequence(1, size(toks) - 2),
            |  i -> xxhash64(concat_ws(' ', slice(toks, i, 3)))))"""
            .stripMargin).as(Seq("i", "sh"))).cache()
        val dupSh = pos.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2).select(col("sh"))
        val dup = pos.join(dupSh.hint("shuffle_hash"), Seq("sh"), "left_semi")
          .count()
        println(s"[vol] q413 x$sc sites=${pos.count()} dup_sites=$dup")
        pos.unpersist()
        s.catalog.clearCache()
      }
      if (checks("q421")) {
        val (deltas, postings, docs) =
          llm.DupRunStore.compactInputVolumes(s, dir)
        println(s"[vol] q421 x$sc delta_rows=$deltas " +
          s"postings_rows=$postings doc_rows=$docs")
        s.catalog.clearCache()
      }
      if (checks("q244")) {
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct().cache()
        val e = li.as("a")
          .join(li.as("b").hint("shuffle_hash"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("d1"), col("b.p").as("d2"))
          .agg(count(lit(1)).as("sup"))
          .filter(col("sup") >= 2)
          .select(col("d1"), col("d2")).cache()
        val edges = e.unionByName(
          e.select(col("d2").as("d1"), col("d1").as("d2")))
        val deg = edges.groupBy(col("d1").as("w")).agg(count(lit(1)).as("dg"))
        val aw = edges.select(col("d1").as("a"), col("d2").as("w"))
          .join(deg.filter(col("dg") <= 512).hint("shuffle_hash"), "w")
        val wedges = aw.join(
            edges.select(col("d1").as("w"), col("d2").as("b"))
              .hint("shuffle_hash"), Seq("w"))
          .filter(col("a") < col("b")).count()
        println(s"[vol] q244 x$sc edges=${e.count()} wedges=$wedges")
        li.unpersist(); e.unpersist()
      }
      s.catalog.clearCache()
    }
    s.stop()
  }
}
