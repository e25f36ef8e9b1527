package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Num

/** Column profiling — the data-quality pass a training pipeline runs
  * before anything else at 100 TB: per-column row/null/exact-distinct
  * counts, min/max, and an exact integer-cents sum, in long format
  * (one output row per profiled column).
  *
  * Plan: melt the k profiled columns into (col_name, v) rows with one
  * narrow generator (k slim rows per input row — no per-column pass
  * over the table), then ONE hash aggregate keyed on col_name. The
  * melt happens before any shuffle, so the scan still prunes to
  * exactly the profiled columns; distinct counts are exact
  * (`count(DISTINCT v)`), which the oracle can replay — swap in
  * `approx_count_distinct` when a survey-grade answer is enough and
  * the distinct shuffle is the bottleneck.
  */
object Profile {

  /** Profile the named numeric (double-castable) columns.
    * `exactDistinct = false` swaps the exact distinct (a full expand
    * shuffle) for the HLL++ sketch `approx_count_distinct` — the
    * 100 TB survey mode; sketch values differ across engines, so only
    * the exact mode is oracle-comparable. */
  def profile(
      df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    val melted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*)).as("m"))
      .select(col("m.col_name").as("col_name"), col("m.v").as("v"))
    val distinctAgg =
      if (exactDistinct) count_distinct(col("v"))
      else approx_count_distinct(col("v"))
    melted.groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        distinctAgg.as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        sum(Num.cents(col("v"))).as("sum_c"))
      .orderBy(col("col_name"))
  }

  /** DuckDB replay of [[profile]] — keep in lock-step. */
  def profileSql(table: String, cols: Seq[String]): String = {
    val arms = cols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS v FROM $table")
      .mkString("\n  UNION ALL ")
    s"""WITH m AS (
       |  $arms)
       |SELECT col_name, count(*) AS n_rows,
       |  count(*) - count(v) AS n_null,
       |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
       |  min(v) AS min_v, max(v) AS max_v,
       |  ${Num.sumSql(Num.centsSql("v"))} AS sum_c
       |FROM m GROUP BY col_name ORDER BY col_name""".stripMargin
  }
}
