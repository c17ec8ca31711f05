package graft.runner

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.config.PipelineConfig
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

    val spark = graft.GraftSession.local("graft-demo")

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
    val staged = DemoFixtures.stage(work)

    // deterministic clock, seeded past any incidents already in the log
    // so re-runs on the same workdir append unique, ordered run ids
    // (zero-padded: run-id sort is lexicographic)
    val incidentsPath = work.resolve("incidents")
    var tick =
      if (Files.exists(incidentsPath))
        try IncidentLog.read(spark, incidentsPath.toString).count().toInt
        catch { case _: Throwable => 0 }
      else 0
    val runner = new PipelineRunner(spark, staged.configPath,
      work.resolve("warehouse").toString, incidentsPath.toString,
      () => { tick += 1; f"demo-$tick%04d" })
    val incidents = runner.runDemo(staged.v1, staged.v2)

    println(s"workdir: $work")
    println("run_id | stage | status | error_type")
    incidents.foreach(i =>
      println(s"${i.run_id} | ${i.stage} | ${i.status} | ${i.error_type}"))
    val healed = PipelineConfig.load(staged.configPath)
    println(s"healed age.max_null_fraction = " +
      healed.columns.find(_.name == "age").flatMap(_.maxNullFraction).getOrElse("?"))
    val log = IncidentLog.read(spark, work.resolve("incidents").toString)
    val m = IncidentLog.metrics(log)
    println(s"dashboard metrics: total=${m.total} success=${m.success} " +
      s"failed=${m.failed} healed=${m.healed}")
    println("history (newest first):")
    IncidentLog.history(log).select("run_id", "stage", "status")
      .collect().take(6).foreach(r => println(s"  ${r.mkString(" | ")}"))
    spark.stop()
  }
}
