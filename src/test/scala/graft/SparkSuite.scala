package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (lazy), configured
  * like Verify/Bench (UTC, nanos flag, small shuffle partitions). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(
    getClass.getSimpleName, cpus = "4",
    extraConfigs = Map("spark.sql.warehouse.dir" ->
      java.nio.file.Files.createTempDirectory("graft_wh").toString))

  val sf: String = "/root/testdata/sf0.001"
}
