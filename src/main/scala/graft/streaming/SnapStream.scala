package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.ops.SnapTable

/** Continuous ingestion INTO a snapshot-versioned table
  * ([[graft.ops.SnapTable]]): every micro-batch lands as one APPEND
  * snapshot committed idempotently under its batch id
  * ([[SnapTable.commitIfAbsent]]). Exactly-once falls out of the
  * manifest protocol alone: a crash before the manifest rename leaves
  * invisible staged files the retried commit reclaims; a Spark replay
  * of an already-committed batch finds its tag and appends nothing.
  * Readers meanwhile get snapshot isolation and time travel over the
  * live feed — a mid-drain reader keeps the version it opened.
  *
  * Scale: each batch's data files write distributed; the commit adds
  * one manifest (carrying the previous file list — O(files) text).
  * A long-lived drain composes with [[SnapTable.vacuum]] for
  * retention, exactly like the runs-store compaction cycle — with
  * one contract: RETENTION MUST COVER THE REPLAY HORIZON. A tag is
  * idempotent only while its manifest lives; vacuuming past a batch
  * that Spark could still replay re-opens its tag (`SnapTableProps`
  * pins this boundary). Keeping more versions than the checkpoint's
  * uncommitted window is always sufficient.
  */
object SnapStream {

  /** Drain everything available from `stream` into `table` as
    * tagged append snapshots, one per micro-batch (empty batches are
    * skipped — deterministically, so a replayed empty batch skips
    * again). */
  def runIngest(s: SparkSession, stream: DataFrame, table: String,
      ckpt: String): Unit = {
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          SnapTable.commitIfAbsent(s, batch, table, "append",
            s"batch-$batchId")
        ()
      }
      .start()
    q.awaitTermination()
  }
}
