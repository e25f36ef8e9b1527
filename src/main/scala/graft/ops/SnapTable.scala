package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned parquet table — the table-format kernel
  * (Delta/Iceberg-style) reduced to its two load-bearing ideas:
  *
  *  1. readers see only what a MANIFEST names. Data files land first
  *     under `data/b<v>/`; the manifest (one relative path per line)
  *     commits LAST by an atomic filesystem rename. A crash anywhere
  *     before the rename leaves an orphaned staging directory no
  *     reader ever lists — the same marker-last contract the
  *     streaming drains use ([[graft.streaming.IndexCompaction]]),
  *     here giving BATCH writers snapshot isolation.
  *  2. a snapshot never rewrites history: `append` carries the
  *     previous manifest's files plus the new ones (shared files,
  *     no data copy); `overwrite` starts a fresh file list while the
  *     old version's files stay readable — TIME TRAVEL is just
  *     reading an older manifest.
  *
  * Scale: data files are written/read fully distributed; only the
  * manifest — O(#files) text lines — touches the driver. At true
  * 100 TB file counts the manifest itself would be chunked and
  * snapshotted (Delta checkpoints / Iceberg manifest lists); one
  * level is enough to carry the semantics here and the commit
  * protocol is identical.
  */
object SnapTable {

  private def fsOf(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifest(table: String, v: Int) =
    new Path(table, f"manifest-v$v%05d.txt")

  /** Committed versions, ascending (manifest files are the source of
    * truth — staged data without a manifest is invisible). */
  def versions(s: SparkSession, table: String): Seq[Int] = {
    val dir = new Path(table)
    val fs = fsOf(s, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("manifest-v") && n.endsWith(".txt"))
      .map(_.stripPrefix("manifest-v").stripSuffix(".txt").toInt).sorted
  }

  private def manifestLines(s: SparkSession, table: String,
      v: Int): Seq[String] = {
    val fs = fsOf(s, new Path(table))
    val in = fs.open(manifest(table, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Relative data-file paths of snapshot `v` ('#'-prefixed header
    * lines — the commit tag — are metadata, not files). */
  def files(s: SparkSession, table: String, v: Int): Seq[String] =
    manifestLines(s, table, v).filterNot(_.startsWith("#"))

  /** The version already committed under `tag`, if any. O(versions)
    * small manifest reads — at a real deployment's version count the
    * tag→version map would be a side index; the COMMIT contract
    * (manifest header carries the tag atomically with the file list)
    * is the part that matters. */
  def taggedVersion(s: SparkSession, table: String,
      tag: String): Option[Int] =
    versions(s, table).find(v =>
      manifestLines(s, table, v).headOption.contains(s"#tag:$tag"))

  /** Idempotent tagged commit — the exactly-once primitive for
    * streaming replay: if `tag` already committed, nothing is staged
    * and the existing version returns; otherwise a normal [[commit]]
    * whose manifest carries the tag atomically with its file list
    * (a replayed micro-batch can never append its rows twice, because
    * the tag and the files become visible in the same rename). */
  def commitIfAbsent(s: SparkSession, df: DataFrame, table: String,
      mode: String, tag: String): Int =
    taggedVersion(s, table, tag).getOrElse(
      commit(s, df, table, mode, Some(tag)))

  /** Commit `df` as the next snapshot of `table` and return its
    * version. `mode` is "overwrite" (snapshot = df) or "append"
    * (snapshot = previous snapshot's files + df's). */
  def commit(s: SparkSession, df: DataFrame, table: String,
      mode: String, tag: Option[String] = None): Int = {
    require(mode == "overwrite" || mode == "append",
      s"unknown snapshot mode: $mode")
    val prev = versions(s, table)
    val v = prev.lastOption.getOrElse(0) + 1
    val dataDir = new Path(table, s"data/b$v")
    // roll forward over a predecessor's crash: staging for version v
    // with no manifest-v is garbage by the commit contract (the
    // manifest IS the commit) — reclaim it instead of failing
    val fs0 = fsOf(s, dataDir)
    if (fs0.exists(dataDir) && !fs0.exists(manifest(table, v)))
      fs0.delete(dataDir, true)
    df.write.parquet(dataDir.toString)
    val fs = fsOf(s, new Path(table))
    val fresh = fs.listStatus(dataDir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted
      .map(n => s"data/b$v/$n")
    val carried =
      if (mode == "append")
        prev.lastOption.map(files(s, table, _)).getOrElse(Seq.empty)
      else Seq.empty
    require((carried ++ fresh).nonEmpty,
      "refusing to commit an empty snapshot")
    val lines = tag.map(t => s"#tag:$t").toSeq ++ carried ++ fresh
    try claim(fs, table, v, lines)
    catch { case e: java.io.IOException =>
      // losing the race means this writer's snapshot derived from a
      // stale head — its staged data is garbage; reclaim and rethrow
      // for the caller to re-derive and retry
      fs.delete(dataDir, true)
      throw e
    }
    v
  }

  /** The commit point — OPTIMISTIC CONCURRENCY: refuse if another
    * committer already claimed `v` (never silently overwrite a
    * manifest), otherwise stage and atomically rename. A racer
    * landing between the check and the rename still loses: rename
    * does not replace an existing destination, so the `require`
    * fails loudly rather than clobbering the winner. */
  private[graft] def claim(fs: org.apache.hadoop.fs.FileSystem,
      table: String, v: Int, lines: Seq[String]): Unit = {
    if (fs.exists(manifest(table, v)))
      throw new java.io.IOException(
        s"concurrent commit: version $v was claimed by another writer")
    val tmp = new Path(table, s".manifest-v$v.txt.tmp")
    val out = fs.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, manifest(table, v)),
      s"snapshot commit rename failed for version $v")
  }

  /** Retention GC: keep the LAST `keep` versions, delete every data
    * file no kept manifest references, every older manifest, and any
    * orphaned staging directory below the kept horizon. History
    * beyond the horizon stops being readable BY DESIGN — that is the
    * storage-cost contract of retention; the kept versions' reads are
    * untouched (their files are never candidates). Returns the number
    * of data files deleted. */
  def vacuum(s: SparkSession, table: String, keep: Int): Int = {
    require(keep >= 1, "vacuum must keep at least the latest version")
    val vs = versions(s, table)
    require(vs.nonEmpty, s"no committed snapshot under $table")
    val (dropped, kept) = vs.splitAt(math.max(0, vs.size - keep))
    val referenced = kept.flatMap(files(s, table, _)).toSet
    val fs = fsOf(s, new Path(table))
    // CRASH ORDER MATTERS: retire manifests FIRST, then data. A crash
    // after manifest deletion leaves orphaned (unreferenced) files —
    // garbage the next vacuum reclaims; the reverse order would leave
    // a READABLE manifest naming already-deleted files, breaking a
    // historical read that was promised to work
    dropped.foreach(v => fs.delete(manifest(table, v), false))
    val dataRoot = new Path(table, "data")
    var removed = 0
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot).foreach { st =>
      val batch = st.getPath.getName
      val parquets = fs.listStatus(st.getPath).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      val doomed = parquets.filter(p =>
        !referenced.contains(s"data/$batch/${p.getName}"))
      doomed.foreach { p => fs.delete(p, false); removed += 1 }
      // a batch dir with no referenced data left disappears entirely
      // (its _SUCCESS markers go with the dir, never counted above);
      // this is also what reclaims orphaned torn-commit staging
      if (doomed.size == parquets.size) fs.delete(st.getPath, true)
    }
    removed
  }

  /** Read snapshot `version` (latest when None) — exactly the
    * manifest's files, distributed. */
  def read(s: SparkSession, table: String,
      version: Option[Int] = None): DataFrame = {
    val vs = versions(s, table)
    require(vs.nonEmpty, s"no committed snapshot under $table")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"unknown snapshot version $v (have $vs)")
    val paths = files(s, table, v).map(rel => new Path(table, rel).toString)
    s.read.parquet(paths: _*)
  }

  /** Change-data-feed between two keyed states: one full-outer join
    * on `key`, emitting only CHANGED rows — op I (inserted),
    * D (deleted), U (value moved); unchanged keys are suppressed.
    * Keys must be unique per side (they are snapshots of an
    * aggregate/dimension state). Scale: one shuffle on the key, or
    * zero with both snapshots bucketed on it. */
  def diff(old: DataFrame, neu: DataFrame, key: String,
      value: String): DataFrame = {
    val o = old.select(col(key), col(value).as(s"old_$value"))
    val n = neu.select(col(key), col(value).as(s"new_$value"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("op",
        when(col(s"old_$value").isNull, lit("I"))
          .when(col(s"new_$value").isNull, lit("D"))
          .otherwise(lit("U")))
      .filter(col(s"old_$value").isNull || col(s"new_$value").isNull ||
        col(s"old_$value") =!= col(s"new_$value"))
  }
}
