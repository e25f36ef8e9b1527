package graft

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.streaming.EventStream

/** The ADVERSARIAL boundary of the streaming sessionizer's
  * cross-batch ordering contract (VERDICT r11 #5).
  *
  * Contract: per-key event order WITHIN a micro-batch is guaranteed
  * by the planted secondary sort; equivalence with the whole-history
  * batch twin across batches additionally requires that batches
  * arrive in per-key event-time order. `orderLanding` establishes
  * that by ranking FILES (by name or footer-min event time) — which
  * is sufficient exactly when the files' per-key time ranges do not
  * interleave. A landing dir where one file's range OVERLAPS a
  * later-ranked file's range for the same key is beyond any
  * file-level ordering: no permutation of whole files is per-key
  * time-ordered. This spec pins the DETECTED failure on such input —
  * loud, known shape — and the recovery route (re-drain; a single
  * AvailableNow batch has no cross-batch boundary to violate).
  */
class SessionOrderSpec extends SparkSpec {
  import spark.implicits._

  private val gap = 30L
  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_id", LongType),
    StructField("ts_us", LongType)))

  // file b0 holds u1 at t=0 and t=1000 (footer min 0); file b1 holds
  // u1 at t=500 (footer min 500). orderLanding must rank b0 first by
  // name AND by footer min — yet b1's event falls INSIDE b0's range,
  // so the drain sees u1's times as 0, 1000, 500.
  private def adversarialLanding(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ooo").toString
    Seq(
      Seq((1L, 1L, 0L), (1L, 2L, 1000L)),
      Seq((1L, 3L, 500L))).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("user_id", "event_id", "ts_us")
        .coalesce(1).sortWithinPartitions("ts_us", "event_id")
        .write.parquet(s"$tmp/in/b$i.parquet")
    }
    tmp
  }

  test("interleaved per-key file ranges defeat file-level ordering — failure is the known shape") {
    val tmp = adversarialLanding()
    EventStream.orderLanding(spark, s"$tmp/in/*.parquet", byName = true)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*.parquet")
    val got = EventStream.runToMemory(spark,
      EventStream.sessionizeStatefulSorted(spark, src, gapUs = gap),
      "t_ooo_adv", org.apache.spark.sql.streaming.OutputMode.Append)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    val want = EventStream.sessionizeBatch(
        Seq((1L, 1L, 0L), (1L, 2L, 1000L), (1L, 3L, 500L))
          .toDF("user_id", "event_id", "ts_us"), gap)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    // whole-history truth: 0 -> s0, 500 -> s1, 1000 -> s2
    assert(want === Map(1L -> 0L, 2L -> 2L, 3L -> 1L))
    // the streaming drain processed u1 as 0, 1000, then 500: the late
    // event's time is BEHIND the state's lastTs, the gap test
    // (e.ts - lastTs > gap) is negative-false, and the event is
    // absorbed into the CURRENT session — the documented failure
    // shape: a late event can only ever under-split (join the newest
    // session), never invent sessions or crash
    assert(got(1L) === 0L && got(2L) === 1L)
    assert(got(3L) === got(2L), "late event absorbed into newest session")
    assert(got !== want)
  }

  test("the same landing dir is correct under a single-batch drain (no boundary to violate)") {
    val tmp = adversarialLanding()
    val src = spark.readStream.schema(schema)
      .parquet(s"$tmp/in/*.parquet") // no maxFilesPerTrigger: one batch
    val got = EventStream.runToMemory(spark,
      EventStream.sessionizeStatefulSorted(spark, src, gapUs = gap),
      "t_ooo_one", org.apache.spark.sql.streaming.OutputMode.Append)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 1L))
  }

  test("the buffered sessionizer CORRECTS the adversarial case within its delay") {
    // same interleaved landing dir, no orderLanding — plus two flush
    // files for a sentinel user whose far-future events advance the
    // global watermark past u1's buffered events (timeouts fire
    // alongside a subsequent batch; a bounded replay needs that final
    // arrival, a continuous pipeline always has one)
    // timestamps sit ABOVE the initial watermark (0): the stateful
    // operator's late-input filter drops rows at or below the current
    // watermark before the function sees them — which is also the
    // beyond-tolerance degradation mode (too-late events drop, they
    // do not corrupt state)
    val base = 1000000L
    val tmp = java.nio.file.Files.createTempDirectory("graft_ooo3").toString
    Seq(
      Seq((1L, 1L, base), (1L, 2L, base + 1000L)),
      Seq((1L, 3L, base + 500L)),
      Seq((99L, 90L, base + 10000000L)),
      Seq((99L, 91L, base + 20000000L))).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("user_id", "event_id", "ts_us")
        .coalesce(1).sortWithinPartitions("ts_us", "event_id")
        .write.parquet(s"$tmp/in/b$i.parquet")
    }
    EventStream.orderLanding(spark, s"$tmp/in/*.parquet", byName = true)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*.parquet")
      .withColumn("tsT", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.col("ts_us")))
    val got = EventStream.runToMemory(spark,
      EventStream.sessionizeBuffered(spark, src, gapUs = gap,
        delay = "1 second"),
      "t_ooo_buf", org.apache.spark.sql.streaming.OutputMode.Append)
      .filter("user_id = 1")
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    // the buffered variant lands the WHOLE-HISTORY truth on the very
    // input where file-level ordering provably cannot
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 1L))
  }

  test("non-interleaved per-key ranges are exactly the case orderLanding fixes") {
    // same events, but the late file's range does NOT overlap: u1 at
    // 0, 40 in b0; 1000 in b1 — footer-ordered drain equals batch
    val tmp = java.nio.file.Files.createTempDirectory("graft_ooo2").toString
    Seq(
      Seq((1L, 1L, 0L), (1L, 2L, 40L)),
      Seq((1L, 3L, 1000L))).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("user_id", "event_id", "ts_us")
        .coalesce(1).sortWithinPartitions("ts_us", "event_id")
        .write.parquet(s"$tmp/in/b$i.parquet")
    }
    EventStream.orderLanding(spark, s"$tmp/in/*.parquet", byName = true)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*.parquet")
    val got = EventStream.runToMemory(spark,
      EventStream.sessionizeStatefulSorted(spark, src, gapUs = gap),
      "t_ooo_fix", org.apache.spark.sql.streaming.OutputMode.Append)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    val want = EventStream.sessionizeBatch(
        Seq((1L, 1L, 0L), (1L, 2L, 40L), (1L, 3L, 1000L))
          .toDF("user_id", "event_id", "ts_us"), gap)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("drainOrdered: visibility-gated reveal equals the batch twin — no setTimes anywhere") {
    // same non-interleaved landing as the orderLanding fix test, but
    // ordering comes from GATED RENAMES into the staging dir (the
    // manifest pattern): no modtime is ever written or trusted
    val tmp = java.nio.file.Files.createTempDirectory("graft_ooo3").toString
    Seq(
      Seq((1L, 1L, 0L), (1L, 2L, 40L)),
      Seq((1L, 3L, 1000L))).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("user_id", "event_id", "ts_us")
        .coalesce(1).sortWithinPartitions("ts_us", "event_id")
        .write.parquet(s"$tmp/in/b$i.parquet")
    }
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val staged = EventStream.drainOrdered(
        spark, s"$tmp/in/*.parquet", s"$tmp/stage") { sd =>
        q = EventStream.sessionizeStatefulSorted(spark,
            spark.readStream.schema(schema).parquet(s"$sd/*/*.parquet"),
            gapUs = gap)
          .writeStream.format("memory").queryName("t_drain_ord")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .start()
        q
      }
      assert(staged.size === 2 &&
        staged.head.split('/').last.startsWith("000000_b0"))
      // the landing entries were CLAIMED (moved), not copied
      assert(!java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$tmp/in")).iterator().hasNext)
      val got = spark.table("t_drain_ord")
        .select("event_id", "session_idx").as[(Long, Long)]
        .collect().toMap
      val want = EventStream.sessionizeBatch(
          Seq((1L, 1L, 0L), (1L, 2L, 40L), (1L, 3L, 1000L))
            .toDF("user_id", "event_id", "ts_us"), gap)
        .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
      assert(got === want)
    } finally if (q != null) q.stop()
  }
}
