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

  test("streaming dedup drops redelivered event ids across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    // second file redelivers event 2 (the landing-dir redelivery case)
    Seq((1L, 1000000L), (2L, 2000000L)).toDF("event_id", "ts_us")
      .coalesce(1).write.parquet(s"$tmp/a.parquet")
    Seq((2L, 2000000L), (3L, 3000000L)).toDF("event_id", "ts_us")
      .coalesce(1).write.parquet(s"$tmp/b.parquet")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // force separate micro-batches
      .parquet(s"$tmp/*.parquet")
      .withColumn("tsT", timestamp_micros(col("ts_us")))
    val out = EventStream.runToMemory(spark,
      EventStream.dedupStream(src, "10 minutes"), "t_dedup_stream",
      org.apache.spark.sql.streaming.OutputMode.Append)
      .select("event_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L, 3L))
  }

  test("sessionization assumeSorted streams a pre-sorted single-key source lazily") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    // one file, one partition, rows already in (ts_us, event_id) order:
    // the sorted-source contract assumeSorted=true relies on
    Seq((1L, 1L, 0L), (1L, 2L, 50L), (1L, 3L, 300L), (1L, 4L, 350L))
      .toDF("user_id", "event_id", "ts_us")
      .coalesce(1).sortWithinPartitions("ts_us", "event_id")
      .write.parquet(s"$tmp/ev")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts_us", LongType)))
    val src = spark.readStream.schema(schema).parquet(s"$tmp/ev")
    val out = EventStream.runToMemory(spark,
      EventStream.sessionizeStateful(spark, src, gapUs = 100L, assumeSorted = true),
      "t_sorted_sessions", org.apache.spark.sql.streaming.OutputMode.Append)
      .orderBy("event_id").select("session_idx").as[Long].collect()
    assert(out.toSeq === Seq(0L, 0L, 1L, 1L))
  }
}
