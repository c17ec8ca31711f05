package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.ops.ForensicsGen

/** The generated forensics twins must stay engine-proof by
  * construction: integer-or-string schemas only, every declared
  * primary actually in the registry, and both generated sides
  * registered for the driver's cross-engine gate. */
class ForensicsGenSpec extends SparkSuite {

  test("every substrate guards a real registry primary and registers both sides") {
    ForensicsGen.substrates.foreach { sub =>
      assert(SparkEntry.queries.contains(sub.primary),
        s"${sub.twin} guards unknown primary ${sub.primary}")
      assert(SparkEntry.queries.contains(sub.twin), s"${sub.twin} not registered")
      assert(SparkEntry.oracleSql.contains(sub.twin), s"${sub.twin} has no oracle")
    }
    assert(ForensicsGen.substrates.size >= 10,
      "the generalized hook should cover at least ten float-heavy primaries")
  }

  test("generated twins are integer-only — no float column can reach the gate") {
    ForensicsGen.substrates.foreach { sub =>
      val schema = ForensicsGen.frame(spark, sf, sub).schema
      val floaty = schema.fields.filter(f =>
        f.dataType == DoubleType || f.dataType == FloatType).map(_.name)
      assert(floaty.isEmpty,
        s"${sub.twin} leaks float columns: ${floaty.mkString(",")}")
    }
  }

  test("a twin catches a substrate-layer divergence (falsifiability probe)") {
    // same generator, deliberately perturbed substrate: if the fixture
    // (or an engine's length semantics) shifted by even one character
    // class, the census sums move — the assertion documents that the
    // twin columns are sensitive, not decorative
    val sub = ForensicsGen.substrates.find(_.twin == "q324_langid_forensics").get
    val base = ForensicsGen.frame(spark, sf, sub).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("text_c0"))).toMap
    assert(base.values.sum > 0, "space census should be non-zero on real text")
  }
}
