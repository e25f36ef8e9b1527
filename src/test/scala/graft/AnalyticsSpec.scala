package graft

import org.apache.spark.sql.functions._
import graft.queries.MiscQueries

/** Hand-computed cases for the integer-exact analytics semantics,
  * exercised through the SAME code paths the oracle entries run
  * (`MiscQueries.outlierSummary` / `scd2Intervals` / `gapFillCounts`
  * are exactly what `q_outlier_events` / `q_scd2` / `q_gap_fill`
  * call after their table projections).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("3-sigma integer test: a spike at exactly 3 sigma stays unflagged, past it flags") {
    // nine 10.00s + one 100.00: the spike sits EXACTLY at 3 sigma
    // ((x*n-sum)^2 = 9*(n*sumsq-sum^2) = 6.561e9 in cents) — the
    // strict inequality keeps it unflagged
    val atBoundary = ((1 to 9).map(i => (1L, i.toLong, 1000L)) :+
      (1L, 10L, 10000L)).toDF("user_id", "event_id", "x")
    val r1 = MiscQueries.outlierSummary(atBoundary).collect()
    assert(r1.head.getAs[Long]("n_outliers") === 0L)
    assert(r1.head.getAs[Long]("n_events") === 10L)
    assert(r1.head.getAs[Long]("sum_c") === 19000L)
    // ten 10.00s + one 100.00: dev^2 = 8.1e9 > 9*var*n^2 = 7.29e9
    val past = ((1 to 10).map(i => (1L, i.toLong, 1000L)) :+
      (1L, 11L, 10000L)).toDF("user_id", "event_id", "x")
    assert(MiscQueries.outlierSummary(past)
      .head().getAs[Long]("n_outliers") === 1L)
    // a constant-value user never flags (variance 0, dev 0)
    val const = (1 to 4).map(i => (2L, i.toLong, 500L))
      .toDF("user_id", "event_id", "x")
    assert(MiscQueries.outlierSummary(const)
      .head().getAs[Long]("n_outliers") === 0L)
  }

  test("SCD2 intervals tile each user's timeline: consecutive, sentinel-closed") {
    val ev = Seq((1L, 1L, 100L, 5L), (1L, 2L, 250L, 6L),
      (1L, 3L, 400L, 7L), (2L, 4L, 50L, 8L))
      .toDF("user_id", "event_id", "ts_us", "value_c")
    val rows = MiscQueries.scd2Intervals(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5)))
      .sortBy(x => (x._1, x._3))
    assert(rows.toSeq === Seq(
      (1L, 1L, 100L, 250L, 0L), (1L, 2L, 250L, 400L, 0L),
      (1L, 3L, 400L, Long.MaxValue, 1L),
      (2L, 4L, 50L, Long.MaxValue, 1L)))
  }

  test("gap-fill grid covers exactly [min, max] per user with zeros in the holes") {
    val ev = Seq((1L, 5L), (1L, 5L), (1L, 8L), (2L, 3L))
      .toDF("user_id", "hr")
    val got = MiscQueries.gapFillCounts(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 5L, 2L), (1L, 6L, 0L), (1L, 7L, 0L), (1L, 8L, 1L),
      (2L, 3L, 1L)))
  }
}
