package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.ops.SnapTable

/** Drain-age stress for [[SnapStream.runIngest]] — the snapshot-table
  * counterpart of [[ReportStress]]. A long-lived ingestion drain's
  * per-batch commit cost has three candidate age terms: the manifest
  * bytes written per commit (O(new files) by the `#base:` design —
  * never age-linear), the tag scan (newest-first header reads, O(1)
  * on the replay hit path but O(versions) on the every-batch MISS
  * path), and the `versions()` directory listing. Composing
  * [[SnapTable.vacuum]] into the drain bounds the live version count
  * and with it both remaining terms.
  *
  * This harness measures the growth directly: N single-file
  * micro-batches through one AvailableNow drain, per-batch
  * `triggerExecution` from the progress log and per-batch live
  * manifest count from the commit hook — once unvacuumed and once
  * with in-drain vacuum on a cadence (retention >> the replay
  * horizon). Flat tail-vs-head trigger quartiles for the vacuumed
  * drain is the claim under test; the final snapshot must hold every
  * input row exactly once in BOTH studies (vacuum must never change
  * drain results, only history depth).
  *
  * Run: `sbt "runMain graft.streaming.SnapStress [nBatches]
  * [vacuumEvery] [keep]"` (defaults 240, 16, 32). Emits one JSON line
  * per (study, batch) and a summary per study.
  */
object SnapStress {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(240)
    val vacuumEvery = if (args.length > 1) args(1).toInt else 16
    val keep = if (args.length > 2) args(2).toInt else 32
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
      .createTempDirectory("graft_snapstress").toString
    (0 until nBatches).foreach { i =>
      Seq((i.toLong, 100L * (i + 1)))
        .toDF("k", "v")
        .coalesce(1).write.parquet(f"$scratch/in/b$i%05d.parquet")
    }
    EventStream.orderLanding(spark, s"$scratch/in/*.parquet", byName = true)

    val cases = Seq("unvacuumed" -> 0, "vacuumed" -> vacuumEvery)
    val finals = cases.map { case (study, every) =>
      val dir = s"$scratch/$study"
      val tbl = s"$dir/tbl"
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
      val liveVersions = mutable.Map.empty[Long, Int]
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      try {
        SnapStream.runIngest(spark,
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$scratch/in/*.parquet"),
          tbl, s"$dir/ckpt", vacuumEvery = every, keep = keep,
          afterCommit = id =>
            liveVersions(id) = SnapTable.versions(spark, tbl).size)
      } finally {
        org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
        spark.streams.removeListener(listener)
      }
      val wallSec = (System.nanoTime() - t0) / 1e9
      val sumV = SnapTable.read(spark, tbl).agg(sum("v")).as[Long].head()
      val nRows = SnapTable.read(spark, tbl).count()
      trigMs.keys.toSeq.sorted.foreach { b =>
        println(s"""{"study":"$study","batch":$b,"trigger_ms":${trigMs(b)},""" +
          s""""live_versions":${liveVersions.getOrElse(b, -1)}}""")
      }
      val times = trigMs.toSeq.sortBy(_._1).map(_._2.toDouble)
      require(times.nonEmpty,
        s"study $study captured no input-bearing batches — nothing to time")
      val quartile = math.max(1, times.length / 4)
      val head = times.take(quartile).sum / quartile
      val tail = times.takeRight(quartile).sum / quartile
      val ratio = if (head > 0) (tail / head).toString else "null"
      println(s"""{"study":"$study","summary":true,"batches":${times.length},""" +
        s""""wall_sec":$wallSec,"head_q_ms":$head,"tail_q_ms":$tail,""" +
        s""""tail_over_head":$ratio,""" +
        s""""final_versions":${SnapTable.versions(spark, tbl).size},""" +
        s""""n_rows":$nRows,"sum_v":$sumV}""")
      (nRows, sumV)
    }
    require(finals.distinct.length == 1,
      s"vacuum changed the drained table's content: $finals")
    spark.stop()
  }
}
