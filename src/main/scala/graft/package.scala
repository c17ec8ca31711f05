import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.round

package object graft {
  /** A named engine query: (session, testdata scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Shared deterministic-output rounding (oracle hash stability). */
  def r2(c: Column): Column = round(c, 2)
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)
}
