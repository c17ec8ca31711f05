package graft.healing

import graft.config.{ColumnSpec, PipelineConfig}
import graft.quality.DataQuality.DqReport

/** Config-rewrite healing rules (reference `self_healing_agent.py:29-125`):
  * given a failed DQ report, loosen the contract just enough for the
  * observed data, bounded by hard caps. Pure driver-side function —
  * config in, (changes, config) out; persistence is the caller's.
  *
  * R1 (`:60-75`): row count below floor → lower `row_count_min` to the
  *     observed count (never below 0).
  * R2 (`:86-103`): null fraction exceeded → raise `max_null_fraction`
  *     to min(cap, max(prev + step, observed + 0.05)).
  * R3 (`:106-117`): declared column missing → mark it not-required.
  */
object SelfHealing {

  final case class HealingResult(changes: Seq[String], updatedConfig: PipelineConfig) {
    def hasChanges: Boolean = changes.nonEmpty
  }

  val MaxNullFractionCap = 0.8 // self_healing_agent.py:32
  val StepIncrease = 0.2 // self_healing_agent.py:33

  def heal(report: DqReport, cfg: PipelineConfig,
      cap: Double = MaxNullFractionCap, step: Double = StepIncrease): HealingResult = {
    val changes = Seq.newBuilder[String]
    var updated = cfg

    report.failedChecks.foreach { fc =>
      fc.checkType match {
        case "row_count_below_min" =>
          val newMin = math.max(0L, fc.observed.toLong)
          changes += s"Lowered quality.row_count_min from ${cfg.quality.rowCountMin} to $newMin"
          updated = updated.copy(quality = updated.quality.copy(rowCountMin = newMin))

        case "null_fraction_exceeded" =>
          updated = mapColumn(updated, fc.column) { c =>
            val prev = c.maxNullFraction.getOrElse(0.0)
            val newMax = round4(math.min(cap, math.max(prev + step, fc.observed + 0.05)))
            changes += s"Raised columns.${fc.column}.max_null_fraction from $prev to $newMax"
            c.copy(maxNullFraction = Some(newMax))
          }

        case "required_column_has_nulls" =>
          updated = mapColumn(updated, fc.column) { c =>
            val prev = c.maxNullFraction.getOrElse(0.0)
            val newMax = round4(math.min(cap, math.max(prev + step, fc.observed + 0.05)))
            changes += s"Relaxed required column ${fc.column}: required=false, max_null_fraction=$newMax"
            c.copy(required = false, maxNullFraction = Some(newMax))
          }

        case "missing_column" =>
          updated = mapColumn(updated, fc.column) { c =>
            changes += s"Marked missing column ${fc.column} as not required"
            c.copy(required = false)
          }

        case _ => // unknown check type: no rule (reference logs + skips)
      }
    }
    HealingResult(changes.result(), updated)
  }

  private def mapColumn(cfg: PipelineConfig, name: String)(
      f: ColumnSpec => ColumnSpec): PipelineConfig =
    cfg.copy(columns = cfg.columns.map(c => if (c.name == name) f(c) else c))

  private def round4(v: Double): Double = math.rint(v * 10000) / 10000
}
