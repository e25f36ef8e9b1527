package graft.runner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.annotation.tailrec

/** St3: the pipeline state machine — a linear-by-default, dynamically
  * re-routable chain of stages (reference experiment_caller.py:176-227
  * + pipeline_transition.py:25-26; doc test/README.md:259-279).
  *
  * Stages are `DataFrame => DataFrame`; the user-overridable
  * transition hook decides the next stage index after each step
  * (negative / out-of-range stops, mirroring the reference's
  * `-1`/None/overflow break). Control flow is deterministic
  * driver-side; all data work stays inside each stage's plan.
  */
object PipelineRunner {

  case class Stage(name: String, fn: DataFrame => DataFrame)

  /** next-stage hook: (justRanIndex, stageCount, currentFrame) => next. */
  type Transition = (Int, Int, DataFrame) => Int

  val linear: Transition = (i, _, _) => i + 1

  def run(
      input: DataFrame,
      stages: Seq[Stage],
      transition: Transition = linear,
      tagStages: Boolean = true,
      maxSteps: Int = 1000): DataFrame = {

    @tailrec
    def loop(df: DataFrame, idx: Int, step: Int): DataFrame = {
      if (idx < 0 || idx >= stages.length || step >= maxSteps) df
      else {
        val out0 = stages(idx).fn(df)
        val out = if (tagStages)
          out0.withColumn("3_pipeline_stage", lit(idx)) else out0
        loop(out, transition(idx, stages.length, out), step + 1)
      }
    }
    loop(input, 0, 0)
  }
}
