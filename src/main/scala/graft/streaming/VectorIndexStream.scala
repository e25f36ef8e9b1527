package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.ops.{Ivf, Similarity}

/** CONTINUOUS vector-index ingestion — the vector-store write path as
  * a Structured-Streaming drain: arriving embedding batches assign to
  * their nearest centroid and append cluster-partitioned
  * inverted-list rows; queries are served from the PERSISTED standing
  * index, never from the stream.
  *
  * The quantizer is trained OFFLINE from a snapshot and FROZEN — the
  * contract every production IVF store uses (re-training moves
  * assignments, so the quantizer versions with the index, exactly as
  * the mixture rates version with the curation drain). Each batch is
  * therefore pure per-row arithmetic against a broadcast centroid
  * table: the drain holds no cross-batch state beyond the index
  * partitions themselves.
  *
  * Idempotence is the established marker-last contract: per-batch
  * overwrite partitions, the per-cluster count manifest commits LAST
  * (`manifest/batch=N/_SUCCESS` is the marker), a redelivered batch
  * sees its marker and no-ops, and [[IndexCompaction]] bounds the
  * standing partition count in-drain with crash-safe roll-forward.
  */
object VectorIndexStream {

  /** Drain `stream` (vec_id, embedding) through assignment with
    * `Trigger.AvailableNow`; returns the accumulated per-cluster
    * manifest (batch, cluster, n_vecs). */
  def runIngest(
      s: SparkSession, stream: DataFrame,
      centroids: Array[Array[Double]], indexDir: String,
      manifestDir: String, checkpointDir: String,
      compactEvery: Option[Int] = None, keepRecent: Int = 2): DataFrame = {
    compactEvery.foreach(n => require(n >= 1, "compactEvery must be >= 1"))
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(s, batch, centroids, indexDir, manifestDir, batchId)
        IndexCompaction.maybeCompact(s, new Path(manifestDir),
          Seq(new Path(indexDir) -> Seq("cluster")), batchId,
          compactEvery, keepRecent)
      }
      .start()
    q.awaitTermination()
    val md = new Path(manifestDir)
    val fs = md.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(md), s"no manifest rows written under $manifestDir")
    s.read.option("basePath", manifestDir).parquet(manifestDir)
      .withColumn("batch", col("batch").cast("long"))
      .orderBy(col("batch"), col("cluster"))
  }

  /** One ingestion cycle — also usable by a batch caller. Idempotent
    * per (dirs, batchId). */
  def ingestBatch(
      s: SparkSession, batch: DataFrame,
      centroids: Array[Array[Double]], indexDir: String,
      manifestDir: String, batchId: Long): Unit =
    graft.core.CacheScope.withScope {
      val conf = s.sparkContext.hadoopConfiguration
      val ifs = new Path(indexDir).getFileSystem(conf)
      val mfs = new Path(manifestDir).getFileSystem(conf)
      IndexCompaction.recover(ifs, new Path(indexDir))
      if (mfs.exists(new Path(s"$manifestDir/batch=$batchId/_SUCCESS")))
        return
      val asg = graft.core.CacheScope.cache(
        Ivf.assigned(Similarity.prepared(batch), centroids))
      asg.select(col("cluster"), col("vec_id"), col("v"), col("nrm"))
        .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
      asg.groupBy(col("cluster")).agg(count(lit(1)).as("n_vecs"))
        .write.mode("overwrite").parquet(s"$manifestDir/batch=$batchId")
    }

  /** Probe-limited top-k served from the STANDING index: only
    * marker-committed batches are read (a torn batch — index written,
    * manifest not — is invisible), each query probes its `nProbe`
    * nearest clusters, candidates score exact cosine. Same
    * plan shape as [[Ivf.ivfTopK]]'s query side: broadcast probes,
    * cluster equi-join, rank window over slim (q_id, vec_id, sim). */
  def searchStanding(
      s: SparkSession, indexDir: String, manifestDir: String,
      queries: DataFrame, centroids: Array[Array[Double]],
      k: Int, nProbe: Int): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val ifs = new Path(indexDir).getFileSystem(conf)
    val mfs = new Path(manifestDir).getFileSystem(conf)
    IndexCompaction.recover(ifs, new Path(indexDir))
    val committed = IndexCompaction.batchIds(mfs, new Path(manifestDir))
      .filter(b => mfs.exists(new Path(s"$manifestDir/batch=$b/_SUCCESS")))
    require(committed.nonEmpty, s"no committed batches under $manifestDir")
    val present = IndexCompaction.batchIds(ifs, new Path(indexDir))
      .filter(committed.toSet)
    val idx = s.read.option("basePath", indexDir)
      .parquet(present.map(b => s"$indexDir/batch=$b"): _*)
      .drop("batch")
    val cdf = Ivf.centroidFrame(s, centroids)
    val probes = Similarity.prepared(queries)
      .crossJoin(broadcast(cdf))
      .withColumn("s", Similarity.dot(col("v"), col("c")) - col("half"))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("s").desc, col("j"))))
      .filter(col("pr") <= nProbe)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("j").as("cluster"))
    val scored = idx.join(broadcast(probes), Seq("cluster"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim",
        Similarity.dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.select(col("q_id"), col("vec_id"), col("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }
}
