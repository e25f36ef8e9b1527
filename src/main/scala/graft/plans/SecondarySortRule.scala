package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{FlatMapGroupsWithState, LogicalPlan, RepartitionByExpression, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Secondary-sort injection for stateful group processing.
  *
  * Spark's streaming checker forbids `sortWithinPartitions` on a
  * streaming Dataset (UnsupportedOperationChecker: "Sorting is not
  * supported on streaming DataFrames/Datasets"), yet
  * `FlatMapGroupsWithStateExec` only requires child ordering on the
  * GROUP KEY — the order of rows WITHIN a group is whatever the
  * shuffle happened to deliver. A sessionizer that must see events in
  * event-time order is then stuck buffering each group in memory
  * (`toSeq.sortBy`), which a hot key can blow up.
  *
  * This rule closes that gap at the sanctioned extension point: as a
  * per-micro-batch optimizer rule (registered on
  * `spark.experimental.extraOptimizations`, which runs during each
  * `IncrementalExecution` — i.e. AFTER the one-time streaming-support
  * check) it plants
  *
  *   RepartitionByExpression(key) + local Sort(key, ts_us, event_id)
  *
  * directly under the `FlatMapGroupsWithState` node. The planner then
  * finds the operator's required distribution (hash on key at the
  * session shuffle-partition count) and required ordering (key
  * prefix) already satisfied, inserts nothing further, and each group
  * iterator arrives in (ts_us, event_id) order — produced by
  * `SortExec`, which SPILLS, unlike any in-function buffer.
  *
  * Contract: fires only on `FlatMapGroupsWithState` nodes whose data
  * attributes contain `ts_us` and `event_id` (the engine's event
  * shape); idempotent under the optimizer's fixed-point loop.
  */
object SecondarySortRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case f: FlatMapGroupsWithState
        if wantsSecondarySort(f) && !alreadyPlanted(f) =>
      val order = (f.groupingAttributes ++
        Seq("ts_us", "event_id")
          .flatMap(n => f.dataAttributes.find(_.name == n)))
        .map(SortOrder(_, Ascending))
      f.copy(child = Sort(order, global = false,
        RepartitionByExpression(f.groupingAttributes, f.child, None)))
  }

  private def wantsSecondarySort(f: FlatMapGroupsWithState): Boolean =
    Seq("ts_us", "event_id").forall(n => f.dataAttributes.exists(_.name == n))

  private def alreadyPlanted(f: FlatMapGroupsWithState): Boolean =
    f.child match {
      case s: Sort => !s.global && s.child.isInstanceOf[RepartitionByExpression]
      case _ => false
    }

  /** Idempotently register on a live session. */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(this))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ this
}
