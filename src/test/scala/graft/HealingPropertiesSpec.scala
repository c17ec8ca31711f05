package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.config.{ColumnSpec, DriftConfig, PipelineConfig, QualityConfig}
import graft.healing.SelfHealing
import graft.quality.DataQuality.{DqReport, FailedCheck}

/** Property-based invariants for the healing rules (SURVEY.md §5),
  * sampled deterministically from ScalaCheck generators (the
  * scalatest-scalacheck bridge isn't on the offline classpath, so
  * sampling is explicit): thresholds stay within bounds, the row-count
  * floor never goes negative, and healing is a no-op on passing
  * reports. */
class HealingPropertiesSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def cfgWith(maxNf: Option[Double], rowMin: Long): PipelineConfig =
    PipelineConfig("", "t", "", Seq(ColumnSpec("c", "int", required = false, maxNf)),
      QualityConfig(rowMin), DriftConfig("", 0.5))

  test("healed max_null_fraction is capped at 0.8 and covers the observation") {
    val gen = for {
      observed <- Gen.choose(0.0, 1.0)
      prev <- Gen.choose(0.0, 0.8)
    } yield (observed, prev)
    samples(gen).foreach { case (observed, prev) =>
      val report = DqReport(10, Map("c" -> observed), Seq(
        FailedCheck("null_fraction_exceeded", "c", observed, prev, "")))
      val healed = SelfHealing.heal(report, cfgWith(Some(prev), 1))
        .updatedConfig.columns.head.maxNullFraction.get
      assert(healed <= 0.8 + 1e-9, s"cap breached: $healed (obs=$observed prev=$prev)")
      assert(healed >= math.min(0.8, observed + 0.05) - 1e-4,
        s"does not cover observation: $healed (obs=$observed)")
      assert(healed >= math.min(0.8, prev + 0.2) - 1e-4,
        s"step not applied: $healed (prev=$prev)")
    }
  }

  test("row_count_min never goes negative") {
    samples(Gen.zip(Gen.choose(-5L, 100L), Gen.choose(0L, 1000L))).foreach {
      case (observed, prevMin) =>
        val report = DqReport(math.max(observed, 0), Map.empty, Seq(
          FailedCheck("row_count_below_min", "", observed.toDouble, prevMin.toDouble, "")))
        val result = SelfHealing.heal(report, cfgWith(None, prevMin))
        assert(result.updatedConfig.quality.rowCountMin >= 0)
    }
  }

  test("a passing report produces no changes") {
    samples(Gen.choose(0L, 1000L)).foreach { n =>
      val report = DqReport(n, Map("c" -> 0.0), Seq.empty)
      val result = SelfHealing.heal(report, cfgWith(Some(0.2), 1))
      assert(!result.hasChanges)
      assert(result.updatedConfig == cfgWith(Some(0.2), 1))
    }
  }

  test("healing a required-nulls failure relaxes the column but keeps bounds") {
    samples(Gen.choose(0.0, 1.0)).foreach { observed =>
      val cfg = PipelineConfig("", "t", "",
        Seq(ColumnSpec("c", "int", required = true, None)),
        QualityConfig(1), DriftConfig("", 0.5))
      val report = DqReport(10, Map("c" -> observed), Seq(
        FailedCheck("required_column_has_nulls", "c", observed, 0.0, "")))
      val healedCol = SelfHealing.heal(report, cfg).updatedConfig.columns.head
      assert(!healedCol.required)
      assert(healedCol.maxNullFraction.exists(v => v > 0.0 && v <= 0.8 + 1e-9))
    }
  }
}
