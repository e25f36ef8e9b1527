package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** 100×-FILE-COUNT PLANNING REHEARSAL — what happens to the
  * manifest kernel's DRIVER costs when the table reaches 10⁴–10⁵
  * manifest lines and the commit chain grows into the thousands
  * (the shape a year-old ingestion drain leaves behind). Three costs
  * are measured separately, because they scale differently:
  *
  *  - CLAIM (commit publication): write one manifest of `linesPer`
  *    lines + rename — O(new lines), must stay flat in table size;
  *  - CHAIN WALK (resolve a version's file list): O(chain depth)
  *    manifest READS + O(total lines) parsing — the cost every
  *    plan pays on an append-only history;
  *  - PICK (manifest-stats pruning): O(total lines) driver filter
  *    over the resolved entries.
  *
  * The rehearsal then writes a HEAD CHECKPOINT
  * ([[SnapTable.checkpointNow]] — the Delta checkpoint-interval
  * move, a pure addition decoupled from retention) and re-times the
  * walk: the deep-chain rung must collapse to the shallow-chain
  * cost, proving walk depth is an OPERATIONAL knob (checkpoint
  * cadence), not a scaling wall. Manifests carry synthetic entry
  * lines (planning never opens a data file — that is the point
  * being measured), with real stats/bytes fields at real line
  * widths, so manifest byte volumes are honest (a 10⁵-line table is
  * ~10 MB of manifest text).
  *
  * Run: `sbt "runMain graft.ops.ManifestScaleStudy [reps]"` (default
  * 5). One JSON line per rung plus a summary.
  */
object ManifestScaleStudy {

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scratch = java.nio.file.Files
      .createTempDirectory("graft_manifeststudy").toString
    // (chain depth, fresh lines per commit): 10⁴ baseline, then 10⁵
    // twice — once as a DEEP chain (the drain-ages-a-year shape),
    // once SHALLOW (same lines, 10× fewer commits) to separate
    // depth cost from line cost
    val rungs = Seq((100, 100), (1000, 100), (100, 1000))

    val rows = rungs.map { case (nVersions, linesPer) =>
      val tbl = s"$scratch/t${nVersions}x$linesPer"
      val fs = new Path(tbl).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path(tbl))
      var claimSecLast = 0.0
      (1 to nVersions).foreach { v =>
        val lo = (v - 1).toLong * linesPer * 64
        val fresh = (0 until linesPer).map { i =>
          val flo = lo + i.toLong * 64
          SnapTable.entryLine(SnapTable.FileEntry(
            f"data/b$v-deadbee$v%01d/part-$i%05d-synthetic.parquet",
            Map("k" -> (flo, flo + 63)), Some(131072L)))
        }
        val lines = Seq(s"#ts:${System.currentTimeMillis()}") ++
          (if (v > 1) Seq(s"#base:${v - 1}") else Nil) ++ fresh
        val t0 = System.nanoTime()
        SnapTable.claim(fs, tbl, v, lines)
        claimSecLast = (System.nanoTime() - t0) / 1e9
      }
      val totalLines = nVersions.toLong * linesPer
      val manifestBytes = (1 to nVersions).map(v =>
        fs.getFileStatus(
          new Path(tbl, f"manifest-v$v%05d.txt")).getLen).sum

      def time[A](f: => A): (Double, A) = {
        var out: A = f // warm (FS cache + JIT)
        val t0 = System.nanoTime()
        (0 until reps).foreach(_ => out = f)
        ((System.nanoTime() - t0) / 1e9 / reps, out)
      }
      val (walkSec, entries) =
        time(SnapTable.fileEntries(spark, tbl, nVersions))
      require(entries.size.toLong == totalLines,
        s"walk resolved ${entries.size} of $totalLines lines")
      val (qlo, qhi) = (totalLines * 64 / 4,
        totalLines * 64 / 4 + totalLines * 8)
      val (pickSec, picked) = time(entries.filter(e =>
        e.stats.get("k").forall { case (mn, mx) =>
          mn <= qhi && mx >= qlo }))
      require(picked.nonEmpty && picked.size < entries.size,
        s"pruning dead: ${picked.size} of ${entries.size}")
      // the OTHER age-linear commit cost: a fresh tag's miss scan
      // reads one header per live version unbounded; the streaming
      // drain bounds it to the replay window (tagScanDepth)
      val (tagMissSec, _) =
        time(SnapTable.taggedVersion(spark, tbl, "never-committed"))
      val (tagBoundedSec, _) = time(
        (1 to nVersions).reverseIterator.take(64).find(v =>
          SnapTable.tagOf(spark, tbl, v).contains("never-committed")))
      // the operational fix for deep chains: one head checkpoint
      SnapTable.checkpointNow(spark, tbl)
      val (ckptWalkSec, entries2) =
        time(SnapTable.fileEntries(spark, tbl, nVersions))
      require(entries2.size == entries.size, "checkpoint changed the list")
      println(s"""{"versions":$nVersions,"lines_per":$linesPer,""" +
        s""""total_lines":$totalLines,"manifest_mb":${
          manifestBytes / 1e6},""" +
        s""""claim_sec":$claimSecLast,"walk_sec":$walkSec,""" +
        s""""pick_sec":$pickSec,"picked":${picked.size},""" +
        s""""tag_miss_sec":$tagMissSec,""" +
        s""""tag_miss_bounded64_sec":$tagBoundedSec,""" +
        s""""ckpt_walk_sec":$ckptWalkSec}""")
      (nVersions, linesPer, claimSecLast, walkSec, ckptWalkSec)
    }
    val deep = rows(1); val shallow = rows(2)
    println(s"""{"summary":true,""" +
      s""""claim_flat_deep_over_base":${deep._3 / rows.head._3},""" +
      s""""deep_walk_over_shallow":${deep._4 / shallow._4},""" +
      s""""ckpt_collapse":${deep._4 / deep._5}}""")
    spark.stop()
  }
}
