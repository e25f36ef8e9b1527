package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Rate stress for the stateful stream entries (PLANS.md r12): drives
  * the landing dir through MULTIPLE micro-batches via
  * `maxFilesPerTrigger` and records, per batch, the state-store row
  * count, input rows, and wall time — the measured evidence for the
  * two state-bound claims the entries make on paper:
  *
  *   - stream-stream join: state is bounded by the WATERMARK HORIZON
  *     (rows whose event time falls behind the watermark evict), so
  *     state tracks the horizon's row density, not rows ingested;
  *   - sketch aggregates (HLL / CMS): state is bounded by SKETCH
  *     WIDTH (2^p resp. d*w rows per group) FOREVER, regardless of
  *     ingest volume.
  *
  * Run: `sbt "runMain graft.streaming.StreamStress [sfDir] [filesPerTrigger]"`
  * (defaults /tmp/sf1, 4). Emits one JSON line per (study, batch) and
  * a summary line per study. NOTE the multi-batch join drain is also
  * the honest place to see LATE-ARRIVAL drops: landing files are not
  * globally time-ordered, so once the watermark advances past a later
  * file's early rows those rows are dropped — the summary reports
  * output rows vs the batch join's count to keep that trade visible
  * (the oracle entry q_stream_join drains in ONE batch, where no row
  * can be late).
  */
object StreamStress {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val perTrigger = if (args.length > 1) args(1) else "4"
    // "ordered": rank the landing files by footer-min event time
    // (EventStream.orderLanding byTime) before the drain — measures
    // how much metadata-only file ordering cuts the late-drop rate
    // vs the raw listing (PLANS.md r12). Mutates mtimes under sfDir.
    val ordered = args.length > 2 && args(2) == "ordered"
    // optional 4th arg: the join's watermark delay (default the
    // entry's production "2 hours") — raising it toward the true
    // disorder bound buys completeness at horizon-state cost; the
    // stress run MEASURES both sides of that trade
    val joinDelay = if (args.length > 3) args(3) else "2 hours"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_STATESTORE=rocksdb flips every stateful operator in
    // the run to the RocksDB provider — state off the JVM heap, the
    // 100 TB posture where a watermark horizon of buffered rows must
    // not compete with execution memory. Default stays the in-heap
    // HDFS-backed store (right for test scale).
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val store = sys.env.getOrElse("SPARK_GRAFT_STATESTORE", "hdfs")
    if (store == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    System.err.println(s"[stress] state store provider: $store")
    spark.sparkContext.setLogLevel("WARN")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_stress").toString
    val opts = Map("maxFilesPerTrigger" -> perTrigger)

    if (ordered)
      // rank the PART FILES (the drain's discovery unit) by footer-min
      // event time; ranking the directory entry would reorder nothing
      EventStream.orderLanding(spark, s"$sfDir/events.parquet/part-*",
        byName = false)

    // ---- stream-stream attribution join (state ~ horizon) ----------
    run(spark, "join", s"$scratch/join", OutputMode.Append) {
      val ev = EventStream.read(spark, sfDir, opts)
      EventStream.attributionJoin(ev, ev, windowUs = 7200000000L,
        delay = joinDelay)
    }
    // an empty landing dir commits no output files — report 0, don't
    // crash before the remaining studies and the summary
    val got =
      try spark.read.parquet(s"$scratch/join/out").count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    val evB = graft.core.Tables.events(spark, sfDir)
    val want = evB.alias("v").filter(col("v.event_type") === "view")
      .join(evB.alias("p"),
        col("v.user_id") === col("p.user_id") &&
        col("p.event_type") === "purchase" &&
        col("p.ts_us") >= col("v.ts_us") &&
        col("p.ts_us") <= col("v.ts_us") + 7200000000L)
      .count()
    println(s"""{"study":"join","rows_out":$got,"rows_batch_join":$want,""" +
      s""""late_dropped":${want - got}}""")

    // ---- late-tolerant buffered sessionizer (state ~ delay x rate) --
    // the r13 oracle entry (q_sessionize_late) runs the delay=range
    // extreme (state = whole corpus); this study measures the
    // PRODUCTION point: delay = the join's knob (default 2 h), state
    // = one horizon of buffered events, emission lagging the
    // watermark, beyond-tolerance rows dropping via the operator's
    // late-input filter — the same trade the join study quantifies,
    // read per batch off the state operator.
    run(spark, "buffered_sessionize", s"$scratch/bsess", OutputMode.Append) {
      EventStream.sessionizeBuffered(spark,
        EventStream.read(spark, sfDir, opts), gapUs = 1800000000L,
        delay = joinDelay)
    }
    val sessGot =
      try spark.read.parquet(s"$scratch/bsess/out").count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    val sessAll = graft.core.Tables.events(spark, sfDir).count()
    println(s"""{"study":"buffered_sessionize","rows_out":$sessGot,""" +
      s""""rows_ingested":$sessAll,""" +
      s""""held_or_dropped":${sessAll - sessGot}}""")

    // ---- streaming HLL registers (state ~ 2^p per group) ------------
    run(spark, "hll", s"$scratch/hll", OutputMode.Update) {
      graft.ops.Hll.registers(
        EventStream.read(spark, sfDir, opts)
          .select(col("event_type"), col("user_id")),
        Seq("event_type"), "user_id", p = 8)
    }

    // ---- streaming CMS counters (state ~ d*w per group) -------------
    run(spark, "cms", s"$scratch/cms", OutputMode.Update) {
      graft.ops.Cms.registers(
        EventStream.read(spark, sfDir, opts)
          .select(col("event_type"), col("user_id")),
        Seq("event_type"), "user_id", d = 4, w = 256)
    }

    spark.stop()
  }

  /** Run `stream` with AvailableNow (which honors maxFilesPerTrigger,
    * unlike Trigger.Once) and print one JSON line per micro-batch
    * from the progress log, plus a summary. Append mode lands rows in
    * a parquet sink (the join study counts them); Update mode goes to
    * the noop sink — the study reads state metrics, not rows (the
    * oracle entries use the foreachBatch register log instead, which
    * is where Update-mode parquet persistence lives). */
  private def run(spark: SparkSession, study: String, dir: String,
      mode: OutputMode)(stream: => DataFrame): Unit = {
    // a measurement tool must not silently truncate its own record:
    // size the progress buffer far above any plausible batch count
    // and flag if a run still hits it
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    val base = stream.writeStream
      .outputMode(mode)
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
    val q = (if (mode == OutputMode.Append)
        base.format("parquet").option("path", s"$dir/out")
      else base.format("noop"))
      .start()
    q.awaitTermination()
    var maxState = 0L
    var lastState = 0L
    var batches = 0
    var totalIn = 0L
    q.recentProgress.foreach { p =>
      val state = Option(p.stateOperators).toSeq.flatten
        .map(_.numRowsTotal).sum
      val durMs = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(-1L)
      if (p.numInputRows > 0 || state > 0) {
        println(s"""{"study":"$study","batch":${p.batchId},""" +
          s""""input_rows":${p.numInputRows},"state_rows":$state,""" +
          s""""trigger_ms":$durMs,"watermark":"${p.eventTime.get("watermark")}"}""")
        maxState = math.max(maxState, state)
        lastState = state
        batches += 1
        totalIn += p.numInputRows
      }
    }
    println(s"""{"study":"$study","summary":true,"batches":$batches,""" +
      s""""rows_ingested":$totalIn,"max_state_rows":$maxState,""" +
      s""""final_state_rows":$lastState,""" +
      s""""progress_truncated":${q.recentProgress.length >= 10000}}""")
  }
}
