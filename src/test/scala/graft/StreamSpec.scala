package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.EventStream

class StreamSpec extends SparkSpec {

  test("streaming windowed agg equals batch windowed agg") {
    val streamed = EventStream.runToMemory(spark,
      EventStream.windowedAgg(EventStream.read(spark, sf)), "t_stream_eq")
      .select(unix_micros(col("window.start")).as("w"), col("event_type"),
        col("n"), col("sum_c"))
      .orderBy("w", "event_type").collect()
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.core.Num.cents(col("value"))).as("sum_c"))
      .select(unix_micros(col("window.start")).as("w"), col("event_type"),
        col("n"), col("sum_c"))
      .orderBy("w", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("progress listener observes every input row (St5)") {
    val listener = new EventStream.ProgressListener
    spark.streams.addListener(listener)
    try {
      EventStream.runToMemory(spark,
        EventStream.windowedAgg(EventStream.read(spark, sf)), "t_progress")
      // listener events are async; wait for delivery
      val deadline = System.currentTimeMillis() + 30000
      while (listener.totalRows < 1000 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(listener.totalRows === 1000L)
    } finally spark.streams.removeListener(listener)
  }

  test("stateful streaming sessionization equals batch sessionization") {
    val gap = 1800000000L
    val stateful = EventStream.sessionizeStateful(
        spark, EventStream.read(spark, sf), gap)
    val out = EventStream.runToMemory(spark, stateful, "t_sessions",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .orderBy("user_id", "event_id").collect()
    val batch = EventStream.sessionizeBatch(
        Tables.events(spark, sf).select(col("user_id"), col("event_id"), col("ts_us")), gap)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("session_idx"))
      .orderBy("user_id", "event_id").collect()
    assert(out.length === batch.length)
    out.zip(batch).foreach { case (a, b) => assert(a === b) }
  }
}
