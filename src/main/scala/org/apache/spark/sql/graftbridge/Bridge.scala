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

  /** A forked session sharing the SparkContext and cached data but
    * with an ISOLATED conf — the scoped-conf idiom (set a legacy
    * reader conf on the clone, probe, discard) without mutating the
    * caller's session. `cloneSession` is private[sql] on the classic
    * session, hence this bridge. */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Block until the async listener bus has delivered all queued
    * events — lets specs assert on QueryExecutionListener traffic
    * (e.g. that a write path issued no collect) without sleeps. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** The exact CREATE TABLE column list and INSERT statement Spark's
    * JDBC sink would issue for `url` — dialect dispatch included
    * (JdbcDialects.get is public, but the SQL builders live in the
    * private[sql] JdbcUtils). Lets specs pin the MySQL-dialect SQL
    * for the reference's Load stage without a MySQL server. */
  def jdbcSchemaString(url: String,
      schema: org.apache.spark.sql.types.StructType): String = {
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    JdbcUtils.schemaString(
      org.apache.spark.sql.jdbc.JdbcDialects.get(url), schema,
      caseSensitive = false, None)
  }

  def jdbcInsertStatement(url: String, table: String,
      schema: org.apache.spark.sql.types.StructType): String = {
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    JdbcUtils.getInsertStatement(table, schema, None,
      isCaseSensitive = false,
      org.apache.spark.sql.jdbc.JdbcDialects.get(url))
  }

  /** Executed physical plan of a streaming query's last micro-batch —
    * lets specs assert planning facts (e.g. that a planted repartition
    * + secondary sort satisfied a stateful operator's required
    * distribution/ordering and no extra exchange/sort was inserted).
    * The wrapper and StreamExecution types are private[sql], hence
    * this bridge. */
  def lastStreamingPlan(q: org.apache.spark.sql.streaming.StreamingQuery): String =
    q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
}

/** Analysis-time string-input contract for the engine's custom
  * expressions: a non-string child becomes a clean DATATYPE_MISMATCH
  * error instead of a runtime ClassCastException / codegen compile
  * failure. `AbstractDataType` (the `inputTypes` element type) is
  * private[sql] in Spark 4, so the mixin lives in this bridge
  * package rather than next to the expressions. */
trait ExpectsStringInput
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
}

/** Binary-input twin of [[ExpectsStringInput]]. */
trait ExpectsBinaryInput
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType)
}

/** Ternary `(binary, long, long)` contract with implicit coercion:
  * int-typed dimension columns are cast to long at analysis time
  * instead of hitting `asInstanceOf[Long]` at runtime — preserving
  * the byte-walk family's degrade-to-NULL-never-throw contract for
  * any integral dims input. */
trait ExpectsBinaryLongLongInput
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType,
      org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.LongType)
}
