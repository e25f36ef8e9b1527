package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Stream-stream attribution join + streaming HLL registers: drained
  * streaming results must equal their batch twins row for row, and
  * the streaming plans must carry the state-bounding constructs
  * (watermarks on both join inputs; register state capped at 2^p per
  * group). */
class StreamJoinSpec extends SparkSpec {

  private def batchEvents = graft.core.Tables.events(spark, sf)
    .withColumn("tsT", timestamp_micros(col("ts_us")))

  test("attribution join: drained stream equals the batch theta join") {
    val got = graft.queries.StreamQueries.qStreamJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = batchEvents
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts_us").as("v_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_us"))
    val want = v.join(p, col("user_id") === col("pu") &&
        col("p_us") >= col("v_us") &&
        col("p_us") <= col("v_us") + 7200000000L)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (col("p_us") - col("v_us")).as("gap_us"))
      .orderBy(col("user_id"), col("view_id"), col("purchase_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.toSeq === want.toSeq)
  }

  test("attribution join plan carries watermarks on BOTH inputs") {
    val joined = EventStream.attributionJoin(
      EventStream.read(spark, sf), EventStream.read(spark, sf),
      windowUs = 7200000000L)
    assert(joined.isStreaming)
    val analyzed = joined.queryExecution.analyzed.toString()
    val marks = "EventTimeWatermark".r.findAllIn(analyzed).length
    assert(marks === 2, s"expected 2 watermark nodes, got $marks")
  }

  test("streaming HLL estimate equals the batch estimate") {
    val got = graft.queries.StreamQueries.qHllStream(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"))
    val want = graft.ops.Hll.estimate(
        graft.ops.Hll.registers(ev, Seq("event_type"), "user_id", p = 8),
        Seq("event_type"), p = 8)
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === want.toSeq)
  }

  test("streaming CMS probe equals the batch CMS probe") {
    val got = graft.queries.StreamQueries.qCmsStream(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val want = graft.queries.MiscQueries.qCmsTopk(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty && got.toSeq === want.toSeq)
  }

  test("streaming HLL register state is bounded by m per group") {
    // the drained register log, compacted last-update-wins, can never
    // exceed 2^p rows per group no matter how many rows streamed in
    val regs = graft.ops.Hll.registers(
      batchEvents.select(col("event_type"), col("user_id")),
      Seq("event_type"), "user_id", p = 8)
    val maxPerGroup = regs.groupBy(col("event_type")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxPerGroup <= 256L)
  }
}
