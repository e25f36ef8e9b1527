package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.SnapTable

/** Consumer-age stress for [[CdcStream.watch]] — the CDC counterpart
  * of [[SnapStress]]. A long-lived MV consumer's per-fold cost has
  * the same candidate age terms as an ingestion drain: the source
  * version walk (bounded by SOURCE retention once vacuum runs), the
  * MV tag scan (short-circuited by the head cursor — consumed
  * versions are skipped without any header read), the diff (two
  * bounded STATES, never history), and the merge (MV key space). With
  * vacuum on BOTH tables at a cadence whose retention covers the
  * consumer's lag, every term is age-independent — per-fold cost must
  * come out FLAT over hundreds of source versions.
  *
  * The harness lands `nVersions` source states in waves; each wave is
  * drained by a REAL [[CdcStream.watch]] run (file-source stream over
  * the source's manifest log, AvailableNow — the catch-up posture),
  * per-fold seconds captured by the `onVersion` probe; both tables
  * vacuum each wave. After the study: (1) the standing MV must equal
  * the full recompute from the latest source state BIT-IDENTICALLY —
  * hundreds of incremental folds and one batch rollup are the same
  * answer or CDC is wrong; (2) a second watch run must fold ZERO; and
  * (3) the GAP path is exercised across the source's horizon — the
  * consumer stops, the source moves on and vacuums past unconsumed
  * history, and the next drain must REFUSE rather than double-count.
  *
  * Run: `sbt "runMain graft.streaming.CdcStress [nVersions]
  * [waveSize] [keep]"` (defaults 240, 16, 32). Emits one JSON line
  * per fold and a summary.
  */
object CdcStress {

  def main(args: Array[String]): Unit = {
    val nVersions = args.headOption.map(_.toInt).getOrElse(240)
    val waveSize = if (args.length > 1) args(1).toInt else 16
    val keep = if (args.length > 2) args(2).toInt else 32
    require(keep >= 2 * waveSize,
      "retention must cover the consumer's lag (keep >= 2 waves)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val scratch = java.nio.file.Files
      .createTempDirectory("graft_cdcstress").toString
    val (src, mv) = (s"$scratch/src", s"$scratch/mv")

    // keyed source state: 100 (g, k) cells, 10 MV groups; each
    // version touches 8 rotating keys — the change set is CONSTANT by
    // construction, so any cost growth is consumer age, not data
    val nKeys = 100
    val vals = Array.tabulate(nKeys)(k => k.toLong * 1000L)
    def stateDf(): DataFrame =
      vals.zipWithIndex.map { case (v, k) =>
        (s"g${k % 10}", k.toLong, v)
      }.toSeq.toDF("g", "k", "v")
        .withColumn("sk", concat_ws(":", col("g"), col("k")))
    def landVersion(ver: Int): Unit = {
      (0 until 8).foreach(i => vals((ver * 8 + i) % nKeys) += 1L)
      SnapTable.commit(spark, stateDf(), src, "overwrite")
    }
    val contrib: DataFrame => DataFrame = d =>
      d.groupBy(col("g")).agg(
        sum(coalesce(col("new_v"), lit(0L)) -
          coalesce(col("old_v"), lit(0L))).as("v"))
    def drainWave(onVersion: (Int, Double) => Unit): Unit = {
      val q = CdcStream.watch(spark, src, mv,
        key = "sk", value = "v", carry = Seq("g"), contrib,
        mvKey = "g", mvCols = Seq("v"),
        checkpoint = s"$scratch/ckpt", onVersion = onVersion)
      q.awaitTermination()
    }

    val foldSec = mutable.Map.empty[Int, Double]
    val t0 = System.nanoTime()
    var wave = 0
    (1 to nVersions).foreach { ver =>
      landVersion(ver)
      if (ver % waveSize == 0 || ver == nVersions) {
        drainWave((v, sec) => foldSec(v) = sec)
        SnapTable.vacuum(spark, src, keep)
        SnapTable.vacuum(spark, mv, keep)
        wave += 1
      }
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    foldSec.keys.toSeq.sorted.foreach { v =>
      println(s"""{"fold":$v,"sec":${foldSec(v)}}""")
    }
    require(foldSec.size == nVersions,
      s"watcher folded ${foldSec.size} of $nVersions versions")

    // 1. bit-identical to the batch rollup of the latest source state
    val standing = SnapTable.read(spark, mv)
      .filter(col("v") =!= 0L).orderBy("g")
      .as[(String, Long)].collect().toSeq
    val direct = SnapTable.read(spark, src).groupBy("g")
      .agg(sum("v").as("v")).orderBy("g")
      .as[(String, Long)].collect().toSeq
    require(standing == direct,
      s"incremental folds diverged from the batch rollup:\n$standing\n$direct")
    // 2. a replayed drain folds zero
    drainWave((v, _) => throw new IllegalStateException(
      s"replayed drain re-folded version $v"))

    // 3. the gap path: the consumer stops, the source moves on and
    // vacuums past unconsumed history — the drain must REFUSE
    (1 to 2 * keep).foreach(i => landVersion(nVersions + i))
    SnapTable.vacuum(spark, src, keep = 1)
    val gap = try {
      CdcStream.runMaintain(spark, src, mv, "sk", "v", Seq("g"),
        contrib, "g", Seq("v")); false
    } catch { case e: IllegalArgumentException =>
      e.getMessage.contains("CDC gap")
    }
    require(gap, "a vacuumed-past source must refuse the fold")

    val times = foldSec.toSeq.sortBy(_._1).map(_._2)
    val q4 = math.max(1, times.length / 4)
    val head = times.take(q4).sum / q4
    val tail = times.takeRight(q4).sum / q4
    println(s"""{"summary":true,"folds":${times.length},"waves":$wave,""" +
      s""""wall_sec":$wallSec,"head_q_sec":$head,"tail_q_sec":$tail,""" +
      s""""tail_over_head":${tail / head},""" +
      s""""src_versions":${SnapTable.versions(spark, src).size},""" +
      s""""mv_versions":${SnapTable.versions(spark, mv).size},""" +
      s""""gap_refused":true}""")
    spark.stop()
  }
}
