package graft.runner

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.config.{ColumnSpec, DriftConfig, PipelineConfig, QualityConfig}
import graft.incidents.IncidentLog

/** Runnable twin of the reference's `python -m src.pipeline_runner`
  * (`pipeline_runner.py:69-223`): stages the customers fixture pair,
  * runs the 4-stage self-healing demo, and prints the incident trace
  * and healed contract.
  *
  * Usage: sbt "runMain graft.runner.DemoMain [workDir]"
  * (workDir defaults to a temp directory; it will hold the staged
  * fixtures, config, warehouse parquet, profile and incident log.)
  */
object DemoMain {
  def main(args: Array[String]): Unit = {
    val work = Paths.get(args.headOption.getOrElse(
      Files.createTempDirectory("graft_demo").toString))
    Files.createDirectories(work)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // S11 environment reset (pipeline_runner.py:31-45,71): drop the
    // warehouse and metadata profile, keep the incident log
    val profile = work.resolve("reference_profile.json")
    Files.deleteIfExists(profile)
    val wh = work.resolve("warehouse")
    if (Files.exists(wh)) {
      Files.walk(wh).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }

    // stage fixtures (FIXTURES.md §1 — the reference's clean/broken pair)
    val v1 = work.resolve("customers_v1.csv")
    Files.writeString(v1,
      """customer_id,name,age,country
        |1,Alice,25,India
        |2,Bob,31,USA
        |3,Charlie,29,UK
        |4,Deepa,42,India
        |""".stripMargin)
    val v2 = work.resolve("customers_v2_broken.csv")
    Files.writeString(v2,
      """customer_id,name,age,country
        |1,Alice,25,India
        |2,Bob,,USA
        |3,Charlie,thirty,UK
        |4,Deepa,42,India
        |5,Evan,,Canada
        |""".stripMargin)
    val cfgPath = work.resolve("pipeline_config.yml").toString
    PipelineConfig.save(PipelineConfig(
      warehousePath = work.resolve("warehouse").toString,
      tableName = "customers",
      sourcePath = v1.toString,
      columns = Seq(
        ColumnSpec("customer_id", "int", required = true, None),
        ColumnSpec("name", "string", required = true, None),
        ColumnSpec("age", "int", required = false, Some(0.2)),
        ColumnSpec("country", "string", required = false, None)),
      quality = QualityConfig(rowCountMin = 1),
      drift = DriftConfig(work.resolve("reference_profile.json").toString, 0.5)),
      cfgPath)

    var tick = 0
    val runner = new PipelineRunner(spark, cfgPath,
      work.resolve("warehouse").toString, work.resolve("incidents").toString,
      () => { tick += 1; f"demo-$tick%02d" })
    val incidents = runner.runDemo(v1.toString, v2.toString)

    println(s"workdir: $work")
    println("run_id | stage | status | error_type")
    incidents.foreach(i =>
      println(s"${i.run_id} | ${i.stage} | ${i.status} | ${i.error_type}"))
    val healed = PipelineConfig.load(cfgPath)
    println(s"healed age.max_null_fraction = " +
      healed.columns.find(_.name == "age").flatMap(_.maxNullFraction).getOrElse("?"))
    val m = IncidentLog.metrics(IncidentLog.read(spark, work.resolve("incidents").toString))
    println(s"dashboard metrics: total=${m.total} success=${m.success} " +
      s"failed=${m.failed} healed=${m.healed}")
    spark.stop()
  }
}
