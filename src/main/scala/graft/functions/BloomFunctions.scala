package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] — the same sketch
  * Spark's own `DataFrameStatFunctions.bloomFilter` builds with a
  * distributed treeAggregate.
  *
  * The serialized filter travels with the expression (plan references,
  * one copy per task set — exactly how broadcast-less literals ship);
  * deserialization happens once per task via the lazy field, and the
  * probe itself is codegen'd into the enclosing WholeStageCodegen
  * stage, so a scan-side pre-filter costs one virtual call per row —
  * no UDF boxing, no shuffle.
  *
  * May return false positives (tunable fpp), NEVER false negatives:
  * callers use it to prune definite non-members early and verify the
  * survivors exactly (see q108 — bloom-gated incremental dedup).
  *
  * The filter travels as an immutable `ArraySeq[Byte]`, NOT a raw
  * `Array[Byte]`: a case class holding an array compares by REFERENCE,
  * so two semantically identical probes would never be `equals` —
  * defeating every canonicalization-based optimization
  * (subexpression elimination, exchange/subplan reuse) for plans that
  * build the probe twice. ArraySeq wraps the same bytes copy-free with
  * element-wise equals/hashCode. */
case class BloomMightContainLong(child: Expression,
    filterBytes: scala.collection.immutable.ArraySeq[Byte])
  extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes.unsafeArray
      .asInstanceOf[Array[Byte]]))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint probe, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    java.lang.Boolean.valueOf(filter.mightContainLong(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $f.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomFunctions {
  /** Column-level probe of a built filter. Null probe → null result
    * (three-valued like every Catalyst predicate) — callers that need
    * "null is new" coalesce explicitly. */
  def mightContain(filter: BloomFilter, c: Column): Column = {
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      filter.writeTo(out)
      out.toByteArray
    }
    org.apache.spark.sql.GraftSqlBridge.column(
      BloomMightContainLong(org.apache.spark.sql.GraftSqlBridge.expression(c),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bytes)))
  }
}
