package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd2

/** SCD2 build/merge: interval chaining, open-row closing, pass-through
  * and new-key semantics, and the incremental ≡ rebuild contract. */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private val pre = Seq(
    (1L, 10L, 100L, "a"), (1L, 50L, 101L, "b"), // key 1: two changes
    (2L, 30L, 102L, "c"), // key 2: one change, untouched by the batch
    (3L, 40L, 103L, "d")) // key 3: open row that the batch closes
    .toDF("k", "ts", "id", "v")
  private val batch = Seq(
    (1L, 100L, 200L, "e"), (1L, 120L, 201L, "f"), // chain of two
    (3L, 80L, 202L, "g"), // closes key 3's open row
    (4L, 90L, 203L, "h")) // brand-new key
    .toDF("k", "ts", "id", "v")

  test("merge: closes open rows at the first batch change; chains; appends; passes through") {
    val merged = Scd2.merge(Scd2.build(pre, "k", "ts", "id"), batch, "k", "ts", "id")
      .select(col("k"), col("id"), col("valid_from"), col("valid_to"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(merged == Set(
      (1L, 100L, 10L, 50L),   // closed within pre-history
      (1L, 101L, 50L, 100L),  // OPEN row closed at key 1's first batch ts
      (1L, 200L, 100L, 120L), // batch rows chain among themselves
      (1L, 201L, 120L, -1L),  // last batch change stays open
      (2L, 102L, 30L, -1L),   // untouched key passes through open
      (3L, 103L, 40L, 80L),   // closed by the batch's only change
      (3L, 202L, 80L, -1L),
      (4L, 203L, 90L, -1L)))  // new key appends open
  }

  test("incremental merge equals full rebuild (the q124 contract)") {
    val merged = Scd2.merge(Scd2.build(pre, "k", "ts", "id"), batch, "k", "ts", "id")
    val rebuilt = Scd2.build(pre.unionByName(batch), "k", "ts", "id")
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty,
      "incremental SCD2 merge must equal the one-pass rebuild")
  }

  test("NULL keys merge like any other group (incremental ≡ rebuild holds)") {
    // build() treats a NULL key as an ordinary window group; the merge
    // join is null-safe, so the NULL key's open row gets closed too
    val preN = Seq((Some(1L), 10L, 100L, "a"), (None: Option[Long], 20L, 101L, "b"))
      .toDF("k", "ts", "id", "v")
    val batchN = Seq((None: Option[Long], 60L, 200L, "c"))
      .toDF("k", "ts", "id", "v")
    val merged = Scd2.merge(Scd2.build(preN, "k", "ts", "id"), batchN, "k", "ts", "id")
    val rebuilt = Scd2.build(preN.unionByName(batchN), "k", "ts", "id")
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty,
      "NULL-key open rows must close on merge — the join must be null-safe")
    val nullRows = merged.filter(col("k").isNull)
      .orderBy(col("valid_from"))
      .select(col("id"), col("valid_to")).collect()
    assert(nullRows.map(_.getLong(0)).toSeq == Seq(101L, 200L))
    assert(nullRows(0).getLong(1) == 60L, "NULL-key open row must close at the batch ts")
    assert(nullRows(1).isNullAt(1))
  }

  test("duplicate timestamps break ties by the tie column, totally ordered") {
    val dup = Seq((7L, 10L, 1L, "x"), (7L, 10L, 2L, "y"), (7L, 20L, 3L, "z"))
      .toDF("k", "ts", "id", "v")
    val h = Scd2.build(dup, "k", "ts", "id")
      .orderBy(col("valid_from"), col("id")).collect()
    assert(h.length == 3)
    // id=1 closed at ts 10 (by id=2), id=2 closed at 20, id=3 open
    assert(h(0).getLong(1) == 1L && h(0).getLong(4) == 10L)
    assert(h(1).getLong(1) == 2L && h(1).getLong(4) == 20L)
    assert(h(2).getLong(1) == 3L && h(2).isNullAt(4))
  }
}
