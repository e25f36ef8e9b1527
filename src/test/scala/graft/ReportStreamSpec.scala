package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.report.Groups
import graft.streaming.ReportStream

/** Incremental report refresh (streaming/ReportStream): multi-batch
  * drain equals the batch section, and a batch touching one group
  * re-derives ONLY that group's partition. */
class ReportStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_type", StringType), StructField("value_c", LongType),
    StructField("value_sum_c", LongType), StructField("user_id", LongType)))

  private val cfg = Groups.GroupConfig(
    category = "event_type",
    showAsSum = Set("value_sum_c"),
    showAsList = Set("user_id"))

  test("multi-batch refresh equals the batch section; untouched groups keep their files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_repstream").toString
    // batch 0 touches groups A and B; batch 1 only B
    val b0 = Seq(("A", 100L, 100L, 1L), ("A", 300L, 300L, 2L), ("B", 50L, 50L, 1L))
    val b1 = Seq(("B", 150L, 150L, 3L), ("B", 250L, 250L, 1L))
    def land(rows: Seq[(String, Long, Long, Long)], i: Int): Unit =
      rows.toDF("event_type", "value_c", "value_sum_c", "user_id")
        .coalesce(1).write.parquet(s"$tmp/in/b$i.parquet")
    def drain() = ReportStream.runRefresh(spark,
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*.parquet"),
        cfg, identity, s"$tmp/runs", s"$tmp/report", s"$tmp/ckpt")
      .select("event_type", "uses", "avg_value_c", "sum_value_sum_c",
        "user_id_list")
      .orderBy("event_type").collect().toSeq
    // two drains over one checkpoint — a real between-batch capture
    // point (file names + sizes, not mtimes, which are granularity-
    // flaky on a fast two-batch drain)
    land(b0, 0)
    drain()
    def aFiles(): Seq[(String, Long)] =
      new java.io.File(s"$tmp/report/event_type=A")
        .listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length()).toSeq.sorted
    val aAfterB0 = aFiles()
    land(b1, 1)
    val got = drain()
    val want = Groups.section(
        (b0 ++ b1).toDF("event_type", "value_c", "value_sum_c", "user_id"),
        cfg)
      .select("event_type", "uses", "avg_value_c", "sum_value_sum_c",
        "user_id_list")
      .orderBy("event_type").collect().toSeq
    assert(got === want)
    assert(got.map(_.getString(0)) === Seq("A", "B"))
    // the runs store is per-batch idempotent and category-partitioned:
    // batch 1 landed ONLY its own group's partition
    val b1parts = new java.io.File(s"$tmp/runs/batch=1")
      .listFiles().filter(_.isDirectory).map(_.getName).toSeq
    assert(b1parts === Seq("event_type=B"))
    // incrementality: batch 1 did not rewrite group A's section files —
    // A's exact file set (names AND sizes) is unchanged by the drain
    assert(aFiles() === aAfterB0)
  }

  test("runs-store compaction bounds the batch-prefix count; refresh result unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_repcompact").toString
    // 6 single-file batches over 3 groups
    val batches = (0 until 6).map { i =>
      Seq((s"G${i % 3}", 100L * (i + 1), 100L * (i + 1), i.toLong))
    }
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("event_type", "value_c", "value_sum_c", "user_id")
        .coalesce(1).write.parquet(s"$tmp/in/b$i.parquet")
    }
    graft.streaming.EventStream.orderLanding(
      spark, s"$tmp/in/*.parquet", byName = true)
    val got = ReportStream.runRefresh(spark,
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*.parquet"),
        cfg, identity, s"$tmp/runs", s"$tmp/report", s"$tmp/ckpt",
        compactEvery = Some(2), keepRecent = 1)
      .select("event_type", "uses", "avg_value_c", "sum_value_sum_c",
        "user_id_list")
      .orderBy("event_type").collect().toSeq
    val want = Groups.section(
        batches.flatten.toDF("event_type", "value_c", "value_sum_c", "user_id"),
        cfg)
      .select("event_type", "uses", "avg_value_c", "sum_value_sum_c",
        "user_id_list")
      .orderBy("event_type").collect().toSeq
    assert(got === want)
    // 6 batches drained, but the store's prefix count is bounded:
    // one compacted fold + at most keepRecent+1 recent prefixes
    val prefixes = new java.io.File(s"$tmp/runs").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch=").toLong).toSeq.sorted
    assert(prefixes.size <= 3, s"store not compacted: $prefixes")
    // nothing lost in the folds: the store still holds every input row
    val n = spark.read.option("basePath", s"$tmp/runs")
      .parquet(s"$tmp/runs/batch=*").count()
    assert(n === batches.flatten.length.toLong)
    // the compacted fold kept the category partitioning (pruning
    // survives compaction)
    val compacted = new java.io.File(s"$tmp/runs/batch=${prefixes.head}")
    assert(compacted.listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("event_type=")))
  }

  test("a compaction crash mid-swap rolls forward before the next refresh reads") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_repswap").toString
    val b0 = Seq(("A", 100L, 100L, 1L), ("B", 50L, 50L, 2L))
    val b1 = Seq(("B", 150L, 150L, 3L))
    def land(rows: Seq[(String, Long, Long, Long)], i: Int): Unit =
      rows.toDF("event_type", "value_c", "value_sum_c", "user_id")
        .coalesce(1).write.parquet(s"$tmp/in/b$i.parquet")
    def drain() = ReportStream.runRefresh(spark,
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*.parquet"),
      cfg, identity, s"$tmp/runs", s"$tmp/report", s"$tmp/ckpt")
    land(b0, 0)
    drain()
    // hand-build the worst crashed swap state: the compacted stage is
    // complete (_SUCCESS written), the source batch=0 was DELETED,
    // but the rename-in never happened — a naive glob read here
    // would see an EMPTY store and silently lose group A forever
    val runs = new org.apache.hadoop.fs.Path(s"$tmp/runs")
    val fs = runs.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.option("basePath", s"$tmp/runs").parquet(s"$tmp/runs/batch=0")
      .drop("batch")
      .write.partitionBy("event_type").parquet(s"$tmp/runs/.compact_0")
    fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/runs/batch=0"), true)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/runs/batch=0")))
    // next refresh must roll the swap forward BEFORE reading
    land(b1, 1)
    val got = drain()
      .select("event_type", "uses", "avg_value_c", "sum_value_sum_c",
        "user_id_list")
      .orderBy("event_type").collect().toSeq
    val want = Groups.section(
        (b0 ++ b1).toDF("event_type", "value_c", "value_sum_c", "user_id"),
        cfg)
      .select("event_type", "uses", "avg_value_c", "sum_value_sum_c",
        "user_id_list")
      .orderBy("event_type").collect().toSeq
    assert(got === want)
    // the swap completed: stage renamed in, no dot-dir left behind
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/runs/batch=0")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$tmp/runs/.compact_0")))
    val n = spark.read.option("basePath", s"$tmp/runs")
      .parquet(s"$tmp/runs/batch=*").count()
    assert(n === (b0 ++ b1).length.toLong)
  }

  test("retried batch overwrites its own runs dir, not append-duplicates") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_repretry").toString
    val rows = Seq(("A", 100L, 100L, 1L))
      .toDF("event_type", "value_c", "value_sum_c", "user_id")
    // simulate a retry: the same batch id lands twice (as after a
    // foreachBatch failure before checkpoint commit)
    rows.write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$tmp/runs/batch=7")
    rows.write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$tmp/runs/batch=7")
    val n = spark.read.option("basePath", s"$tmp/runs")
      .parquet(s"$tmp/runs/batch=*").count()
    assert(n === 1L)
  }

  test("q_report_stream equals q_report_groups on the same corpus") {
    val cols = Seq("event_type", "uses", "avg_value_c",
      "sum_value_sum_c", "user_id_list")
    val got = graft.queries.StreamQueries.qReportStream(spark, sf)
      .select(cols.map(col): _*).collect().toSeq
    val want = graft.queries.ReportQueries.qReportGroups(spark, sf)
      .select(cols.map(col): _*).orderBy("event_type").collect().toSeq
    assert(got.map(_.toSeq) === want.map(_.toSeq))
    assert(got.nonEmpty)
  }
}
