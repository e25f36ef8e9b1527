package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.report.Groups

/** Drain-age stress for [[ReportStream.runRefresh]]: the refresh reads
  * `runsDir/batch=*`, so WITHOUT compaction its file-listing cost (and
  * the standing scan's partition discovery) grows linearly with the
  * number of micro-batches ever drained — invisible at spec scale,
  * the refresh bottleneck after thousands of batches. This harness
  * measures the growth directly: N single-file micro-batches through
  * one AvailableNow drain, per-batch `triggerExecution` from the
  * progress log, per-batch `batch=*` prefix count from the
  * runs-write hook — once uncompacted and once with in-drain
  * compaction (`compactEvery`) folding old prefixes.
  *
  * Run: `sbt "runMain graft.streaming.ReportStress [nBatches] [groups]
  * [compactEvery]"` (defaults 60, 8, 5). Emits one JSON line per
  * (study, batch) and a summary per study with first-vs-last-quartile
  * mean trigger time — flat (ratio ~1) for the compacted store is the
  * claim under test.
  */
object ReportStress {

  private val schema = StructType(Seq(
    StructField("event_type", StringType), StructField("value_c", LongType),
    StructField("value_sum_c", LongType), StructField("user_id", LongType)))

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(60)
    val groups = if (args.length > 1) args(1).toInt else 8
    val compactEvery = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val scratch = java.nio.file.Files
      .createTempDirectory("graft_repstress").toString
    // one file per batch, round-robin group — the hot-group arrival
    // pattern whose refresh should stay O(own partitions)
    (0 until nBatches).foreach { i =>
      Seq((s"G${i % groups}", 100L * (i + 1), 100L * (i + 1), i.toLong))
        .toDF("event_type", "value_c", "value_sum_c", "user_id")
        .coalesce(1).write.parquet(f"$scratch/in/b$i%05d.parquet")
    }
    EventStream.orderLanding(spark, s"$scratch/in/*.parquet", byName = true)
    val cfg = Groups.GroupConfig(category = "event_type",
      showAsSum = Set("value_sum_c"), showAsList = Set("user_id"))

    val cases = Seq("uncompacted" -> None, "compacted" -> Some(compactEvery))
    val finals = cases.map { case (study, every) =>
      val dir = s"$scratch/$study"
      val trigMs = mutable.Map.empty[Long, Long]
      val listener = new StreamingQueryListener {
        override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          if (p.numInputRows > 0)
            trigMs(p.batchId) =
              Option(p.durationMs.get("triggerExecution"))
                .map(_.longValue).getOrElse(-1L)
        }
        override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      val prefixes = mutable.Map.empty[Long, Int]
      def countPrefixes(): Int = {
        val d = new java.io.File(s"$dir/runs")
        if (!d.exists) 0
        else d.listFiles().count(f =>
          f.isDirectory && f.getName.startsWith("batch="))
      }
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      val got = try {
        ReportStream.runRefresh(spark,
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$scratch/in/*.parquet"),
          cfg, identity, s"$dir/runs", s"$dir/report", s"$dir/ckpt",
          afterRunsWrite = id => { prefixes(id) = countPrefixes(); () },
          compactEvery = every)
      } finally {
        org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
        spark.streams.removeListener(listener)
      }
      val wallSec = (System.nanoTime() - t0) / 1e9
      val sumUses = got.agg(sum("uses")).as[Long].head()
      trigMs.keys.toSeq.sorted.foreach { b =>
        println(s"""{"study":"$study","batch":$b,"trigger_ms":${trigMs(b)},""" +
          s""""store_prefixes":${prefixes.getOrElse(b, -1)}}""")
      }
      val times = trigMs.toSeq.sortBy(_._1).map(_._2.toDouble)
      // a drain that captured no input-bearing progress events is a
      // broken study, not a fast one — fail loudly rather than print
      // NaN/Infinity quartiles
      require(times.nonEmpty,
        s"study $study captured no input-bearing batches — nothing to time")
      if (times.length < 4)
        println(s"""{"study":"$study","warn":"only ${times.length} """ +
          """batches; head/tail quartiles compare single samples"}""")
      val quartile = math.max(1, times.length / 4)
      val head = times.take(quartile).sum / quartile
      val tail = times.takeRight(quartile).sum / quartile
      val ratio = if (head > 0) (tail / head).toString else "null"
      println(s"""{"study":"$study","summary":true,"batches":${times.length},""" +
        s""""wall_sec":$wallSec,"head_q_ms":$head,"tail_q_ms":$tail,""" +
        s""""tail_over_head":$ratio,""" +
        s""""final_prefixes":${countPrefixes()},"sum_uses":$sumUses}""")
      sumUses
    }
    require(finals.distinct.length == 1,
      s"compaction changed the refresh result: $finals")
    spark.stop()
  }
}
