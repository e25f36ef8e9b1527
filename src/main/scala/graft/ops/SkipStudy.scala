package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planner-cost study for the three snapshot read paths — the claim
  * under test is the one PLANS.md makes from design: manifest
  * planning ([[SnapTable.readSkip]]) is O(manifest text) at the
  * driver with ZERO query-time footer IO, footer planning
  * ([[SnapTable.readRange]]) pays one distributed footer probe per
  * live file per query, and both must PICK THE SAME FILES. As the
  * file count grows the footer path's planning cost grows with the
  * table while the manifest path's stays in driver text — this
  * harness measures exactly that crossover instead of asserting it.
  *
  * Method: one snapshot table per file-count rung (range-clustered
  * commits of `batch` files each), the SAME selective range planned
  * `reps` times through both paths, wall time of the PLANNING step
  * only (the file pick — the scan itself is identical by the
  * equality gate). Emits one JSON line per (rung, path) and a
  * summary with the per-rung ratio.
  *
  * Run: `sbt "runMain graft.ops.SkipStudy [maxFiles] [reps]"`
  * (defaults 512, 5).
  */
object SkipStudy {

  def main(args: Array[String]): Unit = {
    val maxFiles = args.headOption.map(_.toInt).getOrElse(512)
    val reps = if (args.length > 1) args(1).toInt else 5
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
      .createTempDirectory("graft_skipstudy").toString
    val rungs = Iterator.iterate(32)(_ * 2)
      .takeWhile(_ <= maxFiles).toSeq
    val rows = rungs.map { nFiles =>
      val tbl = s"$scratch/t$nFiles"
      // range-clustered commits, 32 files each — the manifest grows,
      // the query stays the same middle-quarter range
      val batch = 32
      val perFile = 64
      (0 until nFiles / batch).foreach { b =>
        val lo = b.toLong * batch * perFile
        val df = (lo until lo + batch * perFile).map(k => (k, k))
          .toDF("k", "v")
          .repartitionByRange(batch, col("k"))
          .sortWithinPartitions(col("k"))
        SnapTable.commit(spark, df, tbl,
          if (b == 0) "overwrite" else "append",
          statsCols = Seq("k"))
      }
      val total = nFiles.toLong * perFile
      val (qlo, qhi) = (total / 4, total / 4 + total / 8)
      def time(f: => Seq[String]): (Double, Int) = {
        var picked: Seq[String] = Nil
        val t0 = System.nanoTime()
        (0 until reps).foreach(_ => picked = f)
        ((System.nanoTime() - t0) / 1e9 / reps, picked.size)
      }
      // warm both paths once (JIT + FS caches), then measure
      SnapTable.readSkip(spark, tbl, None, "k", qlo, qhi)
      SnapTable.readRange(spark, tbl, None, "k", qlo, qhi)
      val (manifestSec, nM) = time(
        SnapTable.readSkip(spark, tbl, None, "k", qlo, qhi)._1)
      val (footerSec, nF) = time(
        SnapTable.readRange(spark, tbl, None, "k", qlo, qhi)._1)
      require(nM == nF && nM > 0 && nM < nFiles,
        s"paths disagree or pruning dead: manifest=$nM footer=$nF " +
          s"of $nFiles")
      println(s"""{"files":$nFiles,"picked":$nM,""" +
        s""""manifest_plan_sec":$manifestSec,""" +
        s""""footer_plan_sec":$footerSec,""" +
        s""""footer_over_manifest":${footerSec / manifestSec}}""")
      (nFiles, manifestSec, footerSec)
    }
    val (f0, m0, ft0) = rows.head
    val (f1, m1, ft1) = rows.last
    println(s"""{"summary":true,"rungs":${rows.size},""" +
      s""""manifest_growth":${m1 / m0},"footer_growth":${ft1 / ft0},""" +
      s""""files_growth":${f1.toDouble / f0},""" +
      s""""final_ratio":${ft1 / m1}}""")
    spark.stop()
  }
}
