package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.ops.Funnel

/** Continuous-ingest filter funnel: the staged attrition report
  * ([[Funnel]]) as a Structured Streaming drain. Each micro-batch of
  * arriving documents:
  *
  *  1. computes its per-doc funnel flags (lang gate, Gopher keep,
  *     repetition) over ONLY itself — exactly the batch entry's one
  *     corpus pass, on the batch;
  *  2. resolves its stage-4 survivors first-wins WITHIN the batch,
  *     then against the standing fingerprint index (everything
  *     admitted by earlier batches);
  *  3. appends the survivors' fingerprints to the index and writes
  *     the batch's 5-row funnel — so cumulative per-stage sums over
  *     the drain equal the batch funnel of the concatenated corpus
  *     (stages 0-3 are per-doc flags, additive by construction;
  *     stage 4 keeps exactly one doc per distinct fingerprint
  *     globally, and same-fingerprint docs carry identical text, so
  *     both the doc and the token count agree with the batch twin
  *     regardless of which copy each side kept).
  *
  * Same idempotence contract as [[DedupStream]]: per-batch partition
  * dirs in overwrite mode, the funnel partition commits LAST (its
  * `_SUCCESS` is the batch's marker — present means the whole cycle
  * ran, skip), and the standing side reads only committed
  * `batch < batchId` partitions by explicit path
  * ([[IndexCompaction.readStanding]] — a torn own-batch write can
  * never poison a redelivery). The cycle mechanics (marker gate,
  * recovery, standing anti-join, index append) are
  * [[FunnelStream.survivorCycle]], shared with [[CurationStream]].
  * State is one slim parquet table of fingerprints — no driver-side
  * state store; `compactEvery` bounds its partition count across an
  * unbounded drain via [[IndexCompaction]].
  */
object FunnelStream {

  /** Drain `stream` (a streaming DataFrame of documents) through the
    * funnel with `Trigger.AvailableNow`, then return the accumulated
    * per-batch funnel log (batch, stage_idx, stage, n_docs,
    * n_tokens). Dirs must be on shared storage on a real cluster
    * (they may live on different schemes — each resolves its own
    * FileSystem). */
  def runFunnel(
      s: SparkSession, stream: DataFrame, textCol: String, idCol: String,
      langCol: String, indexDir: String, funnelDir: String,
      checkpointDir: String, compactEvery: Option[Int] = None,
      keepRecent: Int = 2): DataFrame = {
    compactEvery.foreach(n => require(n >= 1, "compactEvery must be >= 1"))
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        funnelBatch(s, batch, textCol, idCol, langCol,
          indexDir, funnelDir, batchId)
        IndexCompaction.maybeCompact(s, new Path(funnelDir),
          Seq(new Path(indexDir) -> Seq("fp")), batchId, compactEvery,
          keepRecent)
      }
      .start()
    q.awaitTermination()
    val fd = new Path(funnelDir)
    val fs = fd.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(fd), s"no funnel rows written under $funnelDir")
    s.read.option("basePath", funnelDir).parquet(funnelDir)
      // the partition column infers as int; the log's contract is long
      .withColumn("batch", col("batch").cast("long"))
      .orderBy(col("batch"), col("stage_idx"))
  }

  /** The shared half of a funnel/curation cycle: compaction
    * recovery, the marker gate, per-batch flags, cross-batch
    * survivors, and the index append. Returns None when `markerDir`'s
    * `batch=batchId` already committed (the redelivery short-circuit);
    * otherwise Some((flags, survivors)) — both cached in the ambient
    * [[graft.core.CacheScope]] — AFTER appending the survivors'
    * fingerprints to `indexDir/batch=batchId`. The caller writes its
    * own outputs and MUST write the `markerDir/batch=batchId`
    * partition last (its `_SUCCESS` is the commit marker this gate
    * tests). */
  private[streaming] def survivorCycle(
      s: SparkSession, batch: DataFrame, textCol: String, idCol: String,
      langCol: String, indexDir: String, markerDir: String,
      batchId: Long): Option[(DataFrame, DataFrame)] = {
    val conf = s.sparkContext.hadoopConfiguration
    val ifs = new Path(indexDir).getFileSystem(conf)
    val mfs = new Path(markerDir).getFileSystem(conf)
    // roll a crashed index compaction forward before reading the
    // standing side (same contract as DedupStream.admitBatch)
    IndexCompaction.recover(ifs, new Path(indexDir))
    if (mfs.exists(new Path(s"$markerDir/batch=$batchId/_SUCCESS")))
      return None
    val f = graft.core.CacheScope.cache(
      Funnel.flags(batch, textCol, idCol, langCol))
    val standing = IndexCompaction.readStanding(s, ifs,
      new Path(indexDir), batchId, f.select(col("fp")))
    // first-wins within the batch, then against everything admitted
    // before it (slim anti-join on the fingerprint only)
    val surv = graft.core.CacheScope.cache(
      Funnel.uniqueWithin(f).join(standing, Seq("fp"), "left_anti"))
    surv.select(col("fp"))
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    Some((f, surv))
  }

  /** One funnel cycle — also directly usable by a batch caller that
    * manages its own batching. Idempotent per (dirs, batchId). */
  def funnelBatch(
      s: SparkSession, batch: DataFrame, textCol: String, idCol: String,
      langCol: String, indexDir: String, funnelDir: String,
      batchId: Long): Unit =
    graft.core.CacheScope.withScope {
      survivorCycle(s, batch, textCol, idCol, langCol, indexDir,
          funnelDir, batchId)
        .foreach { case (f, surv) =>
          Funnel.stageSummary(f, surv)
            .write.mode("overwrite").parquet(s"$funnelDir/batch=$batchId")
        }
    }
}
