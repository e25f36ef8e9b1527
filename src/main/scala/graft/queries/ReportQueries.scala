package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}
import graft.report._

/** Report-engine queries over the `events` table, which plays the
  * run-record role (SURVEY §2.2-§2.7): user_id ~ vmID, event_type ~
  * functionName, value ~ runtime.
  */
object ReportQueries extends graft.QueryModule {

  private def eventsC(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("value_c", Num.cents(col("value")))

  // ---- P11 sentinel fill + O1 sorted columns -----------------------------

  def qSentinelFill(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsC(s, dir)
    val a = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("value_c").as("metric_a"))
    val b = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("value_c").as("metric_b"))
    RunRecords.sortedColumns(RunRecords.unionFill(Seq(a, b)))
      .orderBy(col("event_id"))
  }

  val qSentinelFillSql: String =
    s"""SELECT event_id, metric_a, metric_b, user_id FROM (
       |  SELECT event_id, user_id, ${Num.centsSql("value")} AS metric_a,
       |         CAST(-999999999999 AS BIGINT) AS metric_b
       |  FROM events WHERE event_type = 'signup'
       |  UNION ALL
       |  SELECT event_id, user_id, CAST(-999999999999 AS BIGINT),
       |         ${Num.centsSql("value")}
       |  FROM events WHERE event_type = 'error')
       |ORDER BY event_id""".stripMargin

  // ---- A1-A8 group section + P12 invalidators + P16 warm-up --------------

  def qReportGroups(s: SparkSession, dir: String): DataFrame = {
    val prepared = RunRecords.warmupFilter(
      RunRecords.invalidatorFilter(eventsC(s, dir), Map("event_type" -> "error")),
      "event_id", 100)
      .select(col("event_type"), col("value_c"),
        col("value_c").as("value_sum_c"), col("user_id"))
    Groups.section(prepared, Groups.GroupConfig(
      category = "event_type",
      showAsSum = Set("value_sum_c"),
      showAsList = Set("user_id")))
  }

  val qReportGroupsSql: String =
    s"""SELECT event_type, count(*) AS uses,
       |  round(avg(${Num.centsSql("value")}), 2) AS avg_value_c,
       |  ${Num.sumSql(Num.centsSql("value"))} AS sum_value_sum_c,
       |  array_to_string(list_sort(list_distinct(list(
       |    replace(CAST(user_id AS VARCHAR), ',', ';')))), ';') AS user_id_list
       |FROM events
       |WHERE NOT (CAST(event_type AS VARCHAR) = 'error') AND event_id >= 100
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- J2 tenancy count-join ---------------------------------------------

  def qTenancy(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"))
    Tenancy.enrich(ev, "user_id", "event_type")
      .select(col("event_id"), col("user_id"), col("tenants"),
        col("ztenancy_user_id"))
      .orderBy(col("event_id"))
  }

  val qTenancySql: String =
    """WITH c AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS tenants,
      |         min(CAST(event_type AS VARCHAR)) AS attr
      |  FROM events GROUP BY user_id)
      |SELECT e.event_id, e.user_id, c.tenants,
      |       c.attr || ' - ' || CAST(c.tenants AS VARCHAR) AS ztenancy_user_id
      |FROM events e JOIN c USING (user_id)
      |ORDER BY e.event_id""".stripMargin

  // ---- W1 pipeline running totals ----------------------------------------

  def qPipelineWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsC(s, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value_c"))
    PipelineWindow.runningTotalLong(ev,
        partitionCols = Seq("user_id"),
        orderCols = Seq("ts_us", "event_id"),
        metric = "value_c", as = "run_c")
      .orderBy(col("event_id"))
  }

  val qPipelineWindowSql: String =
    s"""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |  ${Num.centsSql("value")} AS value_c,
       |  CAST(sum(${Num.centsSql("value")}) OVER (
       |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS run_c
       |FROM events ORDER BY event_id""".stripMargin

  // ---- U1 iteration union + P16 ------------------------------------------

  def qUnionIterations(s: SparkSession, dir: String): DataFrame = {
    val base = eventsC(s, dir).select(
      col("event_id"), col("user_id"), col("value_c"))
    val parts = (0 until 3).map(i => base.filter(pmod(col("event_id"), lit(3)) === i))
    RunRecords.warmupFilter(
        RunRecords.combineIterations(parts, "user_id"), "iteration", 1)
      .withColumn("iteration", col("iteration").cast("long"))
      .orderBy(col("event_id"))
  }

  val qUnionIterationsSql: String =
    s"""SELECT event_id, user_id, ${Num.centsSql("value")} AS value_c,
       |  event_id % 3 AS iteration,
       |  CAST(user_id AS VARCHAR) || '[' || CAST(event_id % 3 AS VARCHAR)
       |    || ']' AS user_id_iter
       |FROM events WHERE event_id % 3 >= 1
       |ORDER BY event_id""".stripMargin

  // ---- J1 interval-overlap theta self-join -------------------------------

  def qOverlap(s: SparkSession, dir: String): DataFrame =
    Overlap.binned(Tables.events(s, dir))

  val qOverlapSql: String =
    s"""WITH iv AS (
       |  SELECT event_id AS id, event_type AS k, epoch_us(ts) AS s,
       |         epoch_us(ts) + CAST(round(value*1000000,0) AS BIGINT) AS e
       |  FROM events),
       |pairs AS (
       |  SELECT a.id, least(a.e, b.e) - greatest(a.s, b.s) AS ov
       |  FROM iv a JOIN iv b
       |    ON a.k = b.k AND a.id <> b.id AND a.s < b.e AND b.s < a.e)
       |SELECT i.id AS event_id,
       |  CAST(COALESCE(sum(p.ov), 0) AS BIGINT) AS ov_us,
       |  COALESCE(sum(p.ov), 0) / (i.e - i.s) AS overlap_ratio
       |FROM iv i LEFT JOIN pairs p ON i.id = p.id
       |GROUP BY i.id, i.e, i.s
       |ORDER BY i.id""".stripMargin

  /** A8 per-group raw dump + A9 successful-run count, as one entry:
    * every "run" of the `click` group, columns name-sorted (O1), with
    * the section's run count riding along. Drops `props` (free-text
    * JSON with commas/newlines — the report writer sanitizes it, but
    * the raw dump here mirrors the pruned section shape, P15). */
  def qRawOfGroup(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsC(s, dir)
      .select("event_id", "user_id", "event_type", "ts_us", "value_c")
    Groups.rawOfGroup(ev, "event_type", "click")
      .withColumn("n_runs", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .orderBy(col("event_id"))
  }

  val qRawOfGroupSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
       |              ${Num.centsSql("value")} AS value_c FROM events
       |            WHERE event_type = 'click')
       |SELECT event_id, event_type, ts_us, user_id, value_c,
       |  CAST(count(*) OVER () AS BIGINT) AS n_runs
       |FROM ev ORDER BY event_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_raw_of_group" -> (qRawOfGroup _),
    "q_sentinel_fill" -> (qSentinelFill _),
    "q_report_groups" -> (qReportGroups _),
    "q_tenancy" -> (qTenancy _),
    "q_pipeline_window" -> (qPipelineWindow _),
    "q_union_iterations" -> (qUnionIterations _),
    "q_overlap" -> (qOverlap _))

  def oracleSql: Map[String, String] = Map(
    "q_raw_of_group" -> qRawOfGroupSql,
    "q_sentinel_fill" -> qSentinelFillSql,
    "q_report_groups" -> qReportGroupsSql,
    "q_tenancy" -> qTenancySql,
    "q_pipeline_window" -> qPipelineWindowSql,
    "q_union_iterations" -> qUnionIterationsSql,
    "q_overlap" -> qOverlapSql)
}
