import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** A named engine query: (session, testdata scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame
}
