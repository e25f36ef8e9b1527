package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.ops.Dedup

/** Continuous-ingest dedup: the incremental ADMISSION loop
  * ([[Dedup.admissionReport]]) as a Structured Streaming drain. Each
  * micro-batch of arriving documents:
  *
  *  1. shingles and signs ONLY itself (old text never re-read);
  *  2. reads the standing index — (id, band, bh) band rows plus
  *     (id, g, n_g) shingle-stat rows, parquet partitioned by the
  *     batch that admitted them;
  *  3. candidates via band equi-join, exact-Jaccard verify against
  *     the stored stats, admit/reject at `threshold`;
  *  4. writes the ADMITTED docs' band/shingle rows and its decision
  *     rows — so the next batch dedups against everything admitted
  *     before it.
  *
  * `foreachBatch` is the right sink here and not a compromise: the
  * loop both READS and APPENDS the index within one batch — a
  * self-referential maintenance cycle the declarative sinks cannot
  * express — and every step inside the batch is the same distributed
  * plan the batch entry (`q_dedup_admit`) runs.
  *
  * IDEMPOTENT under at-least-once redelivery: foreachBatch may
  * re-execute a batch id after a failure, so every write lands in a
  * per-batch partition directory with mode=overwrite, the decision
  * write commits LAST (its `_SUCCESS` marker is the batch's commit
  * record — seen => the whole cycle already ran, skip), and the
  * standing side reads only partitions with `batch < batchId`, so a
  * half-written own batch can never leak into its own verify (a doc
  * would otherwise match its first-attempt rows at jaccard 1 and
  * reject itself).
  *
  * Admission semantics are per-batch-vs-standing: duplicates WITHIN
  * one micro-batch are both admitted (intra-batch dedup composes
  * upstream via [[Dedup.minhashCandidates]] when the producer needs
  * it); pair `maxFilesPerTrigger` with [[EventStream.orderLanding]]
  * so arrival order is deterministic and the decision log is
  * replayable. The document-frequency cap uses the STANDING corpus's
  * statistics (an arriving batch cannot see global df), exactly like
  * the batch entry. State is the index itself — no driver-side state
  * store; every structure is a parquet table any engine can read.
  */
object DedupStream {

  /** Drain `stream` (a streaming DataFrame of documents) through the
    * admission loop with `Trigger.AvailableNow`, then return the
    * accumulated decision log. Dirs must be on shared storage on a
    * real cluster (same contract as the other streaming sinks).
    * `compactEvery = Some(n)` runs [[compactIndex]] after every n-th
    * committed batch, keeping the standing side's partition count
    * bounded across an unbounded drain (the compactor is idempotent
    * and crash-safe, so compacting inside the drain loop is sound —
    * the next batch's recovery pass completes any interrupted
    * swap). */
  def runAdmit(
      s: SparkSession, stream: DataFrame, textCol: String, idCol: String,
      indexDir: String, decisionsDir: String, checkpointDir: String,
      threshold: Double = 0.5, maxDf: Long = 1000L,
      compactEvery: Option[Int] = None, keepRecent: Int = 2): DataFrame = {
    compactEvery.foreach(n => require(n >= 1, "compactEvery must be >= 1"))
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(s, batch, textCol, idCol, indexDir, decisionsDir,
          batchId, threshold, maxDf)
        compactEvery.filter(n => (batchId + 1) % n == 0).foreach { _ =>
          compactIndex(s, indexDir, decisionsDir, keepRecent); ()
        }
      }
      .start()
    q.awaitTermination()
    val dec = new Path(decisionsDir)
    val fs = dec.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(dec), s"no decisions written under $decisionsDir")
    s.read.option("basePath", decisionsDir).parquet(decisionsDir)
      .drop("batch")
  }

  /** One admission cycle — also directly usable by a batch caller
    * that manages its own batching. Idempotent per (dirs, batchId):
    * a re-run of a committed batch is a no-op; a re-run of a
    * half-written batch overwrites it cleanly. */
  def admitBatch(
      s: SparkSession, batch: DataFrame, textCol: String, idCol: String,
      indexDir: String, decisionsDir: String, batchId: Long,
      threshold: Double, maxDf: Long): Unit =
    graft.core.CacheScope.withScope {
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new Path(indexDir).getFileSystem(conf)
      // the decision log may live on a different scheme than the
      // index — resolve its own FileSystem for the marker probe
      val dfs = new Path(decisionsDir).getFileSystem(conf)
      // a compaction that crashed mid-swap leaves the index missing
      // rows it has safely staged — roll it forward BEFORE reading
      // the standing side (cheap: one listing per table, which the
      // standing read pays anyway)
      Seq("bands", "shingles")
        .foreach(t => recoverCompaction(fs, new Path(s"$indexDir/$t")))
      val decBatchDir = s"$decisionsDir/batch=$batchId"
      // commit marker: the decision partition's _SUCCESS is written
      // LAST — present means this batch fully ran already
      if (dfs.exists(new Path(s"$decBatchDir/_SUCCESS"))) return

      // committed batch < batchId partitions by explicit path
      // (torn-write-safe: a crashed own-batch write never reaches
      // schema inference — see IndexCompaction.readStanding)
      def standing(dir: String, like: DataFrame): DataFrame =
        IndexCompaction.readStanding(s, fs, new Path(dir), batchId, like)

      val sh0 = Dedup.wordShingles(batch, textCol, idCol)
      val bandsDir = s"$indexDir/bands"
      val shinglesDir = s"$indexDir/shingles"
      // standing-side stats drive the df cap; a fresh index caps nothing
      val oldShAll = graft.core.CacheScope.cache(
        standing(shinglesDir, Dedup.shingleRowsWithCounts(sh0).limit(0)))
      val hot = oldShAll.groupBy(col("g"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("g")
      val newSh = graft.core.CacheScope.cache(Dedup.shingleRowsWithCounts(
        sh0.join(hot, Seq("g"), "left_anti")))
      val newBands = graft.core.CacheScope.cache(Dedup.lshBands(
        Dedup.minhashSignatures(newSh.select("id", "g"))))
      val oldBands = standing(bandsDir, newBands.limit(0))

      val decisions = graft.core.CacheScope.cache(
        Dedup.admissionReport(
          batch.select(col(idCol).as("id")), newSh, newBands,
          oldShAll, oldBands, threshold)
        .withColumn("_batch_id", lit(batchId)))

      // per-batch partition dirs, overwrite mode: every write is
      // idempotent; the next batch sees these rows via batch < N+1
      val admitted = decisions.filter(col("admitted") === 1L).select("id")
      newBands.join(admitted, Seq("id"))
        .write.mode("overwrite").parquet(s"$bandsDir/batch=$batchId")
      newSh.join(admitted, Seq("id"))
        .write.mode("overwrite").parquet(s"$shinglesDir/batch=$batchId")
      decisions.write.mode("overwrite").parquet(decBatchDir)
    }

  // ---- index compaction ---------------------------------------------------

  /** Compact the standing index. Every admission cycle lists and
    * reads ALL prior `batch=K` partitions, so after thousands of
    * batches both the listing and the standing-side scan degrade
    * linearly in drain age. Compaction rewrites all partitions at or
    * below a cutoff into ONE `batch=cutoff` partition per table —
    * bands clustered by (band, bh) and shingles by g, so the
    * compacted row groups carry the min/max stats the standing-side
    * joins skip on.
    *
    * The cutoff is `maxCommitted - keepRecent`: the most recent
    * `keepRecent` committed batches stay as separate partitions — a
    * retention watermark for inspecting or re-driving recent batches.
    * CORRECTNESS never depends on it: a redelivered batch either
    * committed (its decision `_SUCCESS` short-circuits the cycle — it
    * never reads the index again) or did not, in which case its id
    * exceeds every committed id, hence the cutoff, and its
    * `batch < id` standing read sees the compacted partition whole.
    * The decision LOG is never compacted — it is the output, not
    * state the loop re-reads.
    *
    * Crash safety is roll-forward: rows stage into a dot-dir the
    * readers ignore, `_SUCCESS` (written last by the committer) marks
    * the stage complete, and only then are source partitions dropped
    * and the stage renamed in. A crash before `_SUCCESS` discards the
    * stage; a crash after it leaves a state [[recoverCompaction]]
    * completes — and every admission cycle runs recovery first, so a
    * crashed compactor can never silently shrink the standing side.
    * Run between drains (or from a maintenance job); one compactor at
    * a time per index.
    *
    * Returns the cutoff if any table was rewritten. */
  def compactIndex(s: SparkSession, indexDir: String, decisionsDir: String,
      keepRecent: Int = 2): Option[Long] =
    IndexCompaction.compactCommitted(s, new Path(decisionsDir),
      Seq(new Path(s"$indexDir/bands") -> Seq("band", "bh"),
        new Path(s"$indexDir/shingles") -> Seq("g")),
      keepRecent)

  /** See [[IndexCompaction.recover]] (kept for the admission cycle's
    * pre-read recovery call and existing callers). */
  private[graft] def recoverCompaction(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Unit = IndexCompaction.recover(fs, dir)
}
