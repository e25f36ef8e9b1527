package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Generic batch-partitioned-index compaction, shared by every
  * streaming drain that appends `batch=N` partitions to a standing
  * parquet table ([[DedupStream]]'s band/shingle index, the
  * fingerprint indexes of [[FunnelStream]]/[[CurationStream]]).
  * Without it, each cycle's listing and standing-side scan degrade
  * linearly in drain age.
  *
  * Contract (identical to the one [[DedupStream]] established):
  * rewrite all `batch <= cutoff` partitions into ONE `batch=cutoff`
  * partition, clustered on `clusterCols` so the compacted row groups
  * carry the min/max stats the standing-side joins skip on.
  * Crash-safe by roll-forward staging: rows stage into a dot-dir the
  * readers ignore, the committer's `_SUCCESS` (written last) marks
  * the stage complete, only then are sources dropped and the stage
  * renamed in; [[recover]] (run by every cycle before reading the
  * standing side) finishes a crashed swap or discards an aborted
  * stage. One compactor at a time per table.
  */
object IndexCompaction {

  /** Committed `batch=N` partition ids under `dir` (existence only —
    * marker filtering is the caller's policy). */
  def batchIds(fs: FileSystem, dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)

  private def stagePath(dir: Path, cutoff: Long): Path =
    new Path(dir, s".compact_$cutoff")

  /** The standing side of a batch-partitioned index, torn-write-safe:
    * reads ONLY the explicit `batch=K` partition dirs with
    * `K < batchId`. A crash mid-write can tear at most the current
    * batch's own partition (foreachBatch is sequential, so every
    * earlier id committed) — and that partition is excluded by id
    * here, where a whole-directory `read.parquet(dir)` would trip
    * schema inference on its `_temporary`-only contents and wedge
    * every redelivery. Returns `like.limit(0)` when no earlier
    * partition exists (first batch / fresh index). */
  def readStanding(s: SparkSession, fs: FileSystem, dir: Path,
      batchId: Long, like: DataFrame): DataFrame = {
    val parts = batchIds(fs, dir).filter(_ < batchId).sorted
      .map(b => new Path(dir, s"batch=$b").toString)
    if (parts.isEmpty) like.limit(0)
    else s.read.option("basePath", dir.toString).parquet(parts: _*)
      .drop("batch")
  }

  /** In-drain compaction cadence: after each batch whose id completes
    * a `compactEvery` window, compact `tables` against `markerDir`'s
    * committed batches. No-op when `compactEvery` is None. */
  def maybeCompact(s: SparkSession, markerDir: Path,
      tables: Seq[(Path, Seq[String])], batchId: Long,
      compactEvery: Option[Int], keepRecent: Int): Unit =
    compactEvery.filter(n => (batchId + 1) % n == 0).foreach { _ =>
      compactCommitted(s, markerDir, tables, keepRecent); ()
    }

  /** Merge `batch <= cutoff` partitions of one table into
    * `batch=cutoff`; true if a rewrite happened. */
  def compactTable(s: SparkSession, fs: FileSystem, dir: Path,
      cutoff: Long, clusterCols: Seq[String]): Boolean = {
    recover(fs, dir)
    val parts = batchIds(fs, dir).filter(_ <= cutoff)
    if (parts.size < 2) return false // already compact (or empty)
    val stage = stagePath(dir, cutoff)
    fs.delete(stage, true) // a no-_SUCCESS leftover is garbage
    val rows = s.read.option("basePath", dir.toString).parquet(dir.toString)
      .filter(col("batch") <= cutoff)
      .drop("batch")
    rows.repartition(clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.parquet(stage.toString) // committer writes _SUCCESS last
    completeSwap(fs, dir, cutoff)
    true
  }

  /** Partition-preserving variant of [[compactTable]] for stores whose
    * batch partitions are THEMSELVES hive-partitioned (ReportStream's
    * category-partitioned runs store): the compacted `batch=cutoff`
    * keeps the inner `partitionBy(partitionCols)` layout, so the
    * refresh's category partition-pruning survives compaction instead
    * of degrading to row-group stats. Same staging/swap/recover
    * protocol as [[compactTable]]. */
  def compactTablePartitioned(s: SparkSession, fs: FileSystem, dir: Path,
      cutoff: Long, partitionCols: Seq[String]): Boolean = {
    recover(fs, dir)
    val parts = batchIds(fs, dir).filter(_ <= cutoff)
    if (parts.size < 2) return false // already compact (or empty)
    val stage = stagePath(dir, cutoff)
    fs.delete(stage, true)
    s.read.option("basePath", dir.toString).parquet(dir.toString)
      .filter(col("batch") <= cutoff)
      .drop("batch")
      .write.partitionBy(partitionCols: _*)
      .parquet(stage.toString) // committer writes _SUCCESS last
    completeSwap(fs, dir, cutoff)
    true
  }

  /** The swap half: drop source partitions, rename the stage in.
    * Idempotent — every step checks before acting. */
  private def completeSwap(fs: FileSystem, dir: Path, cutoff: Long): Unit = {
    batchIds(fs, dir).filter(_ <= cutoff)
      .foreach(b => fs.delete(new Path(dir, s"batch=$b"), true))
    val stage = stagePath(dir, cutoff)
    if (fs.exists(stage)) {
      val ok = fs.rename(stage, new Path(dir, s"batch=$cutoff"))
      require(ok, s"compaction swap failed renaming $stage")
    }
  }

  /** Roll forward (or discard) a crashed compaction on one table
    * dir: a stage with `_SUCCESS` holds every row of its sources —
    * finish the swap; without it the stage is an aborted write —
    * drop it. */
  def recover(fs: FileSystem, dir: Path): Unit = {
    if (!fs.exists(dir)) return
    fs.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(".compact_"))
      .foreach { stage =>
        if (fs.exists(new Path(stage, "_SUCCESS")))
          completeSwap(fs, dir, stage.getName.stripPrefix(".compact_").toLong)
        else fs.delete(stage, true)
      }
  }

  /** Compact one marker-committed index: `cutoff = max committed −
    * keepRecent` where `committedDir`'s `batch=N/_SUCCESS` markers
    * define commitment. Each path resolves its OWN FileSystem, so
    * the marker log and the index tables may live on different
    * schemes. Returns the cutoff if any table rewrote. */
  def compactCommitted(s: SparkSession, committedDir: Path,
      tables: Seq[(Path, Seq[String])], keepRecent: Int): Option[Long] = {
    require(keepRecent >= 0, "keepRecent must be >= 0")
    val conf = s.sparkContext.hadoopConfiguration
    val mfs = committedDir.getFileSystem(conf)
    val committed = batchIds(mfs, committedDir)
      .filter(b => mfs.exists(new Path(committedDir, s"batch=$b/_SUCCESS")))
    if (committed.isEmpty) return None
    val cutoff = committed.max - keepRecent
    val did = tables.map { case (dir, cols) =>
      compactTable(s, dir.getFileSystem(conf), dir, cutoff, cols)
    }
    if (did.exists(identity)) Some(cutoff) else None
  }
}
