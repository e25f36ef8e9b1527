package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column off Expression; the classic bridge
  * (ExpressionUtils) is private[sql]. This object lives inside the
  * sql package namespace purely to re-export the two conversions the
  * engine's custom Catalyst expressions need. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until the async listener bus has delivered all queued
    * events — lets specs assert on QueryExecutionListener traffic
    * (e.g. that a write path issued no collect) without sleeps. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
