package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The custom-UDAF exemplar from SURVEY §2.10: one typed
  * `Aggregator` computing the reference's whole per-column profile —
  * mean, sample std (ddof=1, n==1 pinned to 0.0 like
  * `drift_detector.py:24`), and null fraction — in a single pass.
  *
  * Merge uses the parallel Welford/Chan update, so the aggregator is
  * associative across partitions: partial states combine on the
  * map side exactly like Spark's built-in moments, and the shuffle
  * carries one 4-double state per group instead of the raw column.
  * Functionally redundant with `avg`/`stddev_samp`/`avg(isNull)` —
  * it exists to exercise the typed-UDAF surface of the capability
  * contract, and ProfileAggregatorSpec pins it to the built-ins'
  * results value-for-value.
  */
object ProfileAggregator {

  /** (rows seen incl. nulls, non-null count, running mean, running M2). */
  final case class Buf(rows: Long, n: Long, mean: Double, m2: Double)

  final case class Profile(mean: Double, std: Double, nullFraction: Double)

  val agg: Aggregator[java.lang.Double, Buf, Profile] =
    new Aggregator[java.lang.Double, Buf, Profile] {
      override def zero: Buf = Buf(0L, 0L, 0.0, 0.0)
      override def reduce(b: Buf, x: java.lang.Double): Buf =
        if (x == null) b.copy(rows = b.rows + 1)
        else {
          val n = b.n + 1
          val d = x.doubleValue - b.mean
          val mean = b.mean + d / n
          Buf(b.rows + 1, n, mean, b.m2 + d * (x.doubleValue - mean))
        }
      override def merge(a: Buf, b: Buf): Buf =
        if (a.n == 0) b.copy(rows = a.rows + b.rows)
        else if (b.n == 0) a.copy(rows = a.rows + b.rows)
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          Buf(a.rows + b.rows, n,
            a.mean + d * b.n / n,
            a.m2 + b.m2 + d * d * a.n * b.n / n)
        }
      override def finish(b: Buf): Profile = Profile(
        mean = if (b.n == 0) Double.NaN else b.mean,
        // ddof=1; n==1 is 0.0 by the reference contract, not null
        std = if (b.n <= 1) 0.0 else math.sqrt(b.m2 / (b.n - 1)),
        nullFraction = if (b.rows == 0) 0.0 else (b.rows - b.n).toDouble / b.rows)
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Profile] = Encoders.product[Profile]
    }

  /** Register as a SQL/DataFrame function: `profile_agg(col)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("profile_agg", org.apache.spark.sql.functions.udaf(agg))
}
