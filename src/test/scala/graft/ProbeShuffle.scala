package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicLong, AtomicInteger}

/** Shuffle-volume probe: drains the named queries through the noop
  * sink and prints, per query, wall seconds, job count, stage count
  * and TOTAL shuffle read/write bytes (from stage metrics) — the
  * evidence for "this change removed an exchange" claims that plan
  * dumps cannot show when lineage is truncated by localCheckpoint
  * (iterative operators: PageRank, connected components). */
object ProbeShuffle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
    graft.core.SessionTune.defaults.foreach {
      case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    graft.core.SessionTune.tuneForData(spark, sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shufRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    args.foreach { name =>
      (1 to runs).foreach { r =>
        jobs.set(0); stages.set(0); shufRead.set(0L); shufWrite.set(0L)
        val t0 = System.nanoTime()
        graft.core.CacheScope.withScope {
          Bench.drain(SparkEntry.queries(name)(spark, sfDir))
        }
        spark.catalog.clearCache()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; settle before reading
        Thread.sleep(500)
        println(f"[probe] $name run$r: $sec%.2f s, jobs=${jobs.get}, " +
          f"stages=${stages.get}, shufRead=${shufRead.get}%,d B, " +
          f"shufWrite=${shufWrite.get}%,d B")
      }
    }
    spark.stop()
  }
}
