package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}
import graft.streaming.EventStream

/** Streaming + sessionization queries (SURVEY §2.9). */
object StreamQueries extends graft.QueryModule {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Real Structured-Streaming execution (file source -> watermarked
    * windowed agg -> memory sink), result returned as a table.
    * Windows are epoch-aligned 1h tumbling — identical to DuckDB's
    * time_bucket. */
  def qStreamWindow(s: SparkSession, dir: String): DataFrame = {
    val name = s"stream_win_${counter.incrementAndGet()}"
    val out = EventStream.runToMemory(s,
      EventStream.windowedAgg(EventStream.read(s, dir)), name)
    out.select(
        unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_c"))
      .orderBy(col("win_start_us"), col("event_type"))
  }

  val qStreamWindowSql: String =
    s"""SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS win_start_us,
       |  event_type, count(*) AS n,
       |  ${Num.sumSql(Num.centsSql("value"))} AS sum_c
       |FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin

  /** Gap-based sessionization, batch-declarative plan (the stateful
    * streaming twin is exercised in specs): 30-minute gap. */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"))
    EventStream.sessionizeBatch(ev, gapUs = 1800000000L)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val qSessionizeSql: String =
    """WITH x AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |        PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |      > 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |y AS (
      |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS session_idx
      |  FROM x)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
      |FROM y GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_window" -> (qStreamWindow _),
    "q_sessionize" -> (qSessionize _))

  def oracleSql: Map[String, String] = Map(
    "q_stream_window" -> qStreamWindowSql,
    "q_sessionize" -> qSessionizeSql)
}
