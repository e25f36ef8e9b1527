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

  /** J4: the `transitions` key-rename map (reference
    * experiment_caller.py:186-196, doc test/README.md:142-143) —
    * between stages, each key `k` present in the passed-on frame is
    * COPIED to `transitions(k)`, overriding any existing column of
    * that name, so stage N's output key feeds stage N+1's
    * differently-named input. The original key stays visible, exactly
    * like the reference's `{**passOn, **lastPayload}` merge. Applied
    * only on frames that continue to another stage, never to the
    * final output. */
  def applyRenames(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (k, k2)) =>
      if (d.columns.contains(k)) d.withColumn(k2, col(k)) else d
    }

  /** @param materializeStages mirror the reference's between-stage
    *   materialization (each invocation's output lands before the
    *   next reads it) with a LAZY `localCheckpoint` at every stage
    *   boundary. Besides fidelity, this caps plan growth: a stage
    *   that references its input more than once (e.g. the
    *   accumulated-run-list shape, `df.union(f(df))`) would otherwise
    *   double the upstream scan count per stage — checkpointed, each
    *   stage computes exactly once however many times the next stage
    *   refers to it. Batch-only (streaming frames cannot checkpoint). */
  def run(
      input: DataFrame,
      stages: Seq[Stage],
      transition: Transition = linear,
      tagStages: Boolean = true,
      maxSteps: Int = 1000,
      keyRenames: Map[String, String] = Map.empty,
      materializeStages: Boolean = false): DataFrame = {

    def continues(idx: Int, step: Int): Boolean =
      idx >= 0 && idx < stages.length && step < maxSteps

    @tailrec
    def loop(df: DataFrame, idx: Int, step: Int): DataFrame = {
      if (!continues(idx, step)) df
      else {
        val out0 = stages(idx).fn(df)
        val out1 = if (tagStages)
          out0.withColumn("3_pipeline_stage", lit(idx)) else out0
        val out = if (materializeStages) out1.localCheckpoint(false) else out1
        val next = transition(idx, stages.length, out)
        val fed = if (continues(next, step + 1)) applyRenames(out, keyRenames)
        else out
        loop(fed, next, step + 1)
      }
    }
    loop(input, 0, 0)
  }
}
