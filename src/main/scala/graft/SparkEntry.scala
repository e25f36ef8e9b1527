package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY §2 contributes one entry to
  * [[queries]]; SQL-expressible ones also contribute a DuckDB oracle
  * to [[oracleSql]] (column names aliased identically on both sides —
  * the driver sorts columns by name before hashing values).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    graft.queries.BaseQueries,
    graft.queries.SalesQueries,
    graft.queries.ReportQueries,
    graft.queries.JoinQueries,
    graft.queries.ScalarQueries,
    graft.queries.TrainingQueries,
    graft.queries.CurationQueries,
    graft.queries.SelectionQueries,
    graft.queries.StreamQueries,
    graft.queries.MiscQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The SURVEY §7.2 end-to-end slice: sales synthesis ->
    * TLQ Transform -> region rollup. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.SalesQueries.qSalesReport(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracleSql).reduce(_ ++ _)
}

/** A group of related query entries (one source file per SURVEY area). */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
