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
  * Currently covers q244's wedge volume (the capped a-w-b join) and
  * its edge volume.
  *
  *   sbt "runMain graft.VolumeCheck [baseDir] [scales]"
  */
object VolumeCheck {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local("graft-volume")
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 30, 100)
    scales.foreach { sc =>
      val dir = ScaleStress.synthesize(s, base, sc)
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
      s.catalog.clearCache()
    }
    s.stop()
  }
}
