package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1: pipeline running totals (reference report_generator.py:115-164).
  *
  * Group runs by (run_id, thread_id), order by pipeline stage, emit
  * the cumulative sum of each numeric metric as `<X>Pipeline`.
  * Reference quirk preserved: values are rounded to 2 decimals
  * *before* accumulation (report_generator.py:153) — `sum(round(x))`,
  * not `round(sum(x))`.
  *
  * Scale: a single hash-partitioned window; partitions are
  * (run, thread) groups of pipeline-stage length (small), so no
  * per-partition blow-up at any n.
  */
object PipelineWindow {

  def runningTotals(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[String],
      metrics: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    metrics.foldLeft(df) { (d, m) =>
      d.withColumn(s"${m}Pipeline", sum(round(col(m), 2)).over(w))
    }
  }

  /** Integer-unit variant for oracle-checked outputs: cumulative sum
    * of an exact long column (cents/micros). */
  def runningTotalLong(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[String],
      metric: String,
      as: String): DataFrame = {
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(col(metric)).over(w))
  }
}
