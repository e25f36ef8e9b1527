package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Num

/** Hand-computed cases for the integer-exact analytics semantics the
  * oracle entries gate end-to-end (`q_outlier_events`, `q_scd2`,
  * `q_gap_fill` replay the same formulas over the corpus; these pin
  * the arithmetic on values small enough to check by hand).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("3-sigma integer test: (x*n - sum)^2 > 9*(n*sumsq - sum^2) flags exactly the planted outlier") {
    // user 1: nine 10.00s and one 100.00 -> mean 19, var dominated by
    // the spike; only the spike flags. user 2: constant -> no flags.
    val ev = ((1 to 9).map(i => (1L, i.toLong, 10.0)) :+ (1L, 10L, 100.0)) ++
      (11 to 14).map(i => (2L, i.toLong, 5.0))
    val df = ev.toDF("user_id", "event_id", "value")
      .select(col("user_id"), col("event_id"), Num.cents(col("value")).as("x"))
    val w = Window.partitionBy(col("user_id"))
    val dev = col("x") * col("n") - col("sm")
    val flags = df
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sm", sum(col("x")).over(w))
      .withColumn("sq", sum(col("x") * col("x")).over(w))
      .withColumn("o",
        (dev * dev > lit(9L) * (col("n") * col("sq") - col("sm") * col("sm")))
          .cast("long"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("o"))
      .toMap
    // hand check, cents: n=10, sum=19000, sumsq=10.9e6*... the spike:
    // x=10000, x*n-sum = 81000 -> 6.561e9; n*sumsq-sum^2 = 7.29e8,
    // *9 = 6.561e9 -> NOT strictly greater. A 9-vs-1 split sits
    // exactly AT 3 sigma; the strict inequality keeps it unflagged.
    assert(flags(10L) === 0L)
    assert(flags.values.sum === 0L)
    // push the spike past the boundary: 10 tens and one 100 (n=11)
    val ev2 = ((1 to 10).map(i => (1L, i.toLong, 10.0)) :+ (1L, 11L, 100.0))
    val f2 = ev2.toDF("user_id", "event_id", "value")
      .select(col("user_id"), col("event_id"), Num.cents(col("value")).as("x"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sm", sum(col("x")).over(w))
      .withColumn("sq", sum(col("x") * col("x")).over(w))
      .withColumn("o",
        (dev * dev > lit(9L) * (col("n") * col("sq") - col("sm") * col("sm")))
          .cast("long"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("o"))
      .toMap
    assert(f2(11L) === 1L)
    assert(f2.values.sum === 1L)
  }

  test("SCD2 intervals tile each user's timeline: consecutive, sentinel-closed") {
    val ev = Seq((1L, 1L, 100L), (1L, 2L, 250L), (1L, 3L, 400L),
      (2L, 4L, 50L))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val rows = ev.toDF("user_id", "event_id", "ts_us")
      .withColumn("valid_to_us",
        coalesce(lead(col("ts_us"), 1).over(w), lit(Long.MaxValue)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3))
    assert(rows.toSeq === Seq(
      (1L, 1L, 100L, 250L), (1L, 2L, 250L, 400L),
      (1L, 3L, 400L, Long.MaxValue), (2L, 4L, 50L, Long.MaxValue)))
  }

  test("gap-fill grid covers exactly [min, max] per user with zeros in the holes") {
    val ev = Seq((1L, 5L), (1L, 5L), (1L, 8L), (2L, 3L))
      .toDF("user_id", "hr")
    val counts = ev.groupBy(col("user_id"), col("hr"))
      .agg(count(lit(1)).as("n_events"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hr"))
    val got = grid.join(counts, Seq("user_id", "hr"), "left")
      .na.fill(0L, Seq("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 5L, 2L), (1L, 6L, 0L), (1L, 7L, 0L), (1L, 8L, 1L),
      (2L, 3L, 1L)))
  }
}
