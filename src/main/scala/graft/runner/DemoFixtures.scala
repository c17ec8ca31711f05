package graft.runner

import java.nio.file.{Files, Path}
import graft.config.{ColumnSpec, DriftConfig, PipelineConfig, QualityConfig}

/** The reference's customers fixture pair + contract (FIXTURES.md §1),
  * staged into a working directory. Single source of truth for both
  * the runnable demo (DemoMain) and the golden-trace spec — editing
  * the fixture in one place keeps demo and assertion in sync. */
object DemoFixtures {

  final case class Staged(v1: String, v2: String, configPath: String)

  def stage(dir: Path): Staged = {
    Files.createDirectories(dir)
    val v1 = dir.resolve("customers_v1.csv")
    Files.writeString(v1,
      """customer_id,name,age,country
        |1,Alice,25,India
        |2,Bob,31,USA
        |3,Charlie,29,UK
        |4,Deepa,42,India
        |""".stripMargin)
    val v2 = dir.resolve("customers_v2_broken.csv")
    Files.writeString(v2,
      """customer_id,name,age,country
        |1,Alice,25,India
        |2,Bob,,USA
        |3,Charlie,thirty,UK
        |4,Deepa,42,India
        |5,Evan,,Canada
        |""".stripMargin)
    val cfgPath = dir.resolve("pipeline_config.yml")
    PipelineConfig.save(PipelineConfig(
      warehousePath = dir.resolve("warehouse").toString,
      tableName = "customers",
      sourcePath = v1.toString,
      columns = Seq(
        ColumnSpec("customer_id", "int", required = true, None),
        ColumnSpec("name", "string", required = true, None),
        ColumnSpec("age", "int", required = false, Some(0.2)),
        ColumnSpec("country", "string", required = false, None)),
      quality = QualityConfig(rowCountMin = 1),
      drift = DriftConfig(dir.resolve("reference_profile.json").toString, 0.5)),
      cfgPath.toString)
    Staged(v1.toString, v2.toString, cfgPath.toString)
  }
}
