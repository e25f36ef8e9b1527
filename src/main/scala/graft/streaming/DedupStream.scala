package graft.streaming

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
  *     (id, g, n_g) shingle-stat rows, plain parquet tables;
  *  3. candidates via band equi-join, exact-Jaccard verify against
  *     the stored stats, admit/reject at `threshold`;
  *  4. appends its decisions to a decision log and the ADMITTED
  *     docs' band/shingle rows to the index — so the next batch
  *     dedups against everything admitted before it.
  *
  * `foreachBatch` is the right sink here and not a compromise: the
  * loop both READS and APPENDS the index within one batch — a
  * self-referential maintenance cycle the declarative sinks cannot
  * express — and every step inside the batch is the same distributed
  * plan the batch entry (`q_dedup_admit`) runs. Admission semantics
  * are per-batch-vs-standing: duplicates WITHIN one micro-batch are
  * both admitted (intra-batch dedup composes upstream via
  * [[Dedup.minhashCandidates]] when the producer needs it); pair
  * `maxFilesPerTrigger` with [[EventStream.orderLanding]] so arrival
  * order is deterministic and the decision log is replayable.
  *
  * The document-frequency cap uses the STANDING corpus's statistics
  * (an arriving batch cannot see global df), exactly like the batch
  * entry. State is the index itself — no driver-side state store;
  * every structure is a parquet table any engine can read.
  */
object DedupStream {

  /** Drain `stream` (a streaming DataFrame of documents) through the
    * admission loop with `Trigger.AvailableNow`, then return the
    * accumulated decision log. Dirs must be on shared storage on a
    * real cluster (same contract as the other streaming sinks). */
  def runAdmit(
      s: SparkSession, stream: DataFrame, textCol: String, idCol: String,
      indexDir: String, decisionsDir: String, checkpointDir: String,
      threshold: Double = 0.5, maxDf: Long = 1000L): DataFrame = {
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(s, batch, textCol, idCol, indexDir, decisionsDir,
          batchId, threshold, maxDf)
      }
      .start()
    q.awaitTermination()
    val dec = new org.apache.hadoop.fs.Path(decisionsDir)
    val fs = dec.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(dec), s"no decisions written under $decisionsDir")
    s.read.parquet(decisionsDir)
  }

  /** One admission cycle — also directly usable by a batch caller
    * that manages its own batching. */
  def admitBatch(
      s: SparkSession, batch: DataFrame, textCol: String, idCol: String,
      indexDir: String, decisionsDir: String, batchId: Long,
      threshold: Double, maxDf: Long): Unit =
    graft.core.CacheScope.withScope {
      val fs = new org.apache.hadoop.fs.Path(indexDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def tableOrEmpty(dir: String, like: DataFrame): DataFrame =
        if (fs.exists(new org.apache.hadoop.fs.Path(dir)))
          s.read.parquet(dir)
        else like.limit(0)

      val sh0 = Dedup.wordShingles(batch, textCol, idCol)
      val bandsDir = s"$indexDir/bands"
      val shinglesDir = s"$indexDir/shingles"
      // standing-side stats drive the df cap; a fresh index caps nothing
      val oldShAll = tableOrEmpty(shinglesDir,
        Dedup.shingleRowsWithCounts(sh0).limit(0))
      val hot = oldShAll.groupBy(col("g"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("g")
      val newSh = graft.core.CacheScope.cache(Dedup.shingleRowsWithCounts(
        sh0.join(hot, Seq("g"), "left_anti")))
      val newBands = graft.core.CacheScope.cache(Dedup.lshBands(
        Dedup.minhashSignatures(newSh.select("id", "g"))))
      val oldBands = tableOrEmpty(bandsDir, newBands.limit(0))

      val decisions = graft.core.CacheScope.cache(
        Dedup.admissionReport(
          batch.select(col(idCol).as("id")), newSh, newBands,
          oldShAll, oldBands, threshold)
        .withColumn("_batch_id", lit(batchId)))
      decisions.write.mode("append").parquet(decisionsDir)

      // append the admitted docs' rows: the index stays current for
      // the NEXT micro-batch
      val admitted = decisions.filter(col("admitted") === 1L).select("id")
      newBands.join(admitted, Seq("id"))
        .write.mode("append").parquet(bandsDir)
      newSh.join(admitted, Seq("id"))
        .write.mode("append").parquet(shinglesDir)
    }
}
