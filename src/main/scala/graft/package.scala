import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.round

package object graft {
  /** A named engine query: (session, testdata scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Shared deterministic-output rounding (oracle hash stability). */
  def r2(c: Column): Column = round(c, 2)
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)

  /** Nudged rounding for integer-derived rationals (ratios of counts,
    * integer-second gaps): such values can land EXACTLY on a round-half
    * boundary, where Spark (BigDecimal HALF_UP over the shortest decimal
    * repr) and DuckDB (C-style over the binary double) disagree. +1e-12
    * pushes the tie off the boundary identically in both engines — the
    * oracle must carry the same `+ 1e-12` inside its round. Floats that
    * pass through volume-scale folds or libm calls sit off-grid already
    * and keep the plain r2/r4/r6 (FloatAudit's RoundedFold class). */
  def r2n(c: Column): Column = round(c + 1e-12, 2)
  def r4n(c: Column): Column = round(c + 1e-12, 4)
  def r6n(c: Column): Column = round(c + 1e-12, 6)
}
