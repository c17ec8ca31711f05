package graft

import org.apache.spark.sql.functions._
import graft.ops.Inference

/** Pins the Wilcoxon signed-rank z on KNOWN small samples — the
  * round-9 advice found the z mis-centered (null mean subtracted
  * twice) while the mirrored oracle kept the cross-engine gate green;
  * this spec is the engine-independent guard the gate cannot be. */
class WilcoxonSpec extends SparkSuite {
  import spark.implicits._

  private def zOf(diffs: Seq[Long]): (Long, Double, Double) = {
    val row = Inference.wilcoxonSignedRank(
      diffs.toDF("d").select(col("d").cast("long").as("d"))).head()
    (row.getLong(0), row.getDouble(1), row.getDouble(2))
  }

  test("two positive diffs give z ~ +1.342 (the advice's example)") {
    val (n, wPlus, z) = zOf(Seq(1L, 2L))
    assert(n === 2L)
    assert(wPlus === 3.0) // ranks 1 + 2
    // W+ = 3, mean = n(n+1)/4 = 1.5, sigma = sqrt(2*3*5/24) = 1.11803
    assert(math.abs(z - 1.341641) < 1e-6)
  }

  test("three positive untied diffs give z ~ +1.604") {
    val (n, wPlus, z) = zOf(Seq(1L, 2L, 3L))
    assert(n === 3L)
    assert(wPlus === 6.0)
    // mean = 3, sigma = sqrt(3*4*7/24) = sqrt(3.5); z = 3/sqrt(3.5)
    assert(math.abs(z - 1.603567) < 1e-6)
  }

  test("sign-symmetric sample gives z = 0 and negation flips the sign") {
    val (_, _, z0) = zOf(Seq(1L, -1L, 2L, -2L, 5L, -5L))
    assert(math.abs(z0) < 1e-9)
    val (_, _, zPos) = zOf(Seq(3L, 4L, 5L, 6L))
    val (_, _, zNeg) = zOf(Seq(-3L, -4L, -5L, -6L))
    assert(zPos > 1.0)
    assert(math.abs(zPos + zNeg) < 1e-9)
  }

  test("zero diffs drop; ties use midranks with the tie correction") {
    // diffs {0, 0, 2, 2, -2}: zeros drop -> n = 3, all |d| = 2 tied,
    // midrank 2 each; W+ = 4, mean = 3, tie3 = 27 - 3 = 24,
    // sigma^2 = (2*3*4*7 - 24)/48 = 144/48 = 3
    val (n, wPlus, z) = zOf(Seq(0L, 0L, 2L, 2L, -2L))
    assert(n === 3L)
    assert(wPlus === 4.0)
    assert(math.abs(z - 1.0 / math.sqrt(3.0)) < 1e-6)
  }
}
