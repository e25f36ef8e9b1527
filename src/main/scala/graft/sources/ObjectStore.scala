package graft.sources

import org.apache.spark.sql.SparkSession

/** S8: object-store connectivity (reference `test/s3pull.py:21-94`
  * bulk S3 pull, `Transform.java:115-151` S3 scan, `:328-338` S3
  * sink).
  *
  * Spark-first, the "S3 puller" disappears as a component: executors
  * read `s3a://bucket/prefix` globs directly through the Hadoop
  * FileSystem API — split planning, predicate pushdown and column
  * pruning all apply to object-store scans exactly as to local ones,
  * and no driver-side staging copy exists. Every reader/writer in
  * [[CsvIO]] (and `spark.read.parquet`/`orc`/`json`) is
  * scheme-agnostic: pass an `s3a://` URI instead of a local path.
  *
  * What the engine owns is the CONFIGURATION surface below — the
  * `fs.s3a.*` settings a production deployment needs. The `hadoop-aws`
  * + AWS SDK jars are deploy-time classpath items (ship them with
  * `--packages org.apache.hadoop:hadoop-aws:<hadoop version>` or the
  * distribution's `spark-hadoop-cloud` module); this container has no
  * egress, so the jars are absent here and `S3AIoSpec` proves the
  * scheme/option plumbing against a local-backed stub FileSystem
  * registered under the `s3a` scheme instead. See README "Object
  * stores (S3)" for the full production recipe, including the
  * zero-rename magic committer wiring.
  */
object ObjectStore {

  /** Production `fs.s3a.*` settings, returned as a plain map so
    * callers can inspect/augment before applying.
    *
    * @param endpoint   non-AWS endpoints (MinIO, Ceph RGW) or a
    *                   region-pinned AWS endpoint
    * @param region     explicit signing region (else SDK resolution)
    * @param pathStyleAccess bucket-in-path addressing for non-AWS
    *                   stores that lack virtual-host DNS
    * @param connectionMaximum pool size — must exceed the executor's
    *                   concurrent stream count (cores × prefetch) or
    *                   scans stall waiting for connections
    * @param multipartSizeMb part size for uploads AND the range-GET
    *                   split granularity of reads
    */
  def s3aSettings(
      endpoint: Option[String] = None,
      region: Option[String] = None,
      pathStyleAccess: Boolean = false,
      connectionMaximum: Int = 96,
      multipartSizeMb: Int = 128): Map[String, String] = {
    val base = Map(
      // credential resolution: env vars -> instance/role profile; an
      // explicit provider chain beats baking keys into site config.
      "fs.s3a.aws.credentials.provider" ->
        ("org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider," +
          "com.amazonaws.auth.EnvironmentVariableCredentialsProvider," +
          "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider"),
      "fs.s3a.connection.maximum" -> connectionMaximum.toString,
      "fs.s3a.threads.max" -> (connectionMaximum / 2).toString,
      "fs.s3a.multipart.size" -> s"${multipartSizeMb}M",
      "fs.s3a.block.size" -> s"${multipartSizeMb}M",
      // columnar scans seek; 'random' keeps range GETs instead of
      // draining the stream on every parquet footer/page jump.
      "fs.s3a.experimental.input.fadvise" -> "random",
      "fs.s3a.fast.upload.buffer" -> "disk",
      // directory-rename commits are O(data) copies on S3; the magic
      // committer makes task commit a metadata operation. Consumed by
      // the S3A committer factory (see README for the Spark-side
      // commitProtocolClass pair that activates it).
      "fs.s3a.committer.name" -> "magic",
      "fs.s3a.committer.magic.enabled" -> "true",
      "fs.s3a.path.style.access" -> pathStyleAccess.toString)
    base ++
      endpoint.map("fs.s3a.endpoint" -> _) ++
      region.map("fs.s3a.endpoint.region" -> _)
  }

  /** Apply settings to the session's Hadoop configuration (the conf
    * every FileSystem instance and every executor-side scan sees). */
  def configure(s: SparkSession, settings: Map[String, String]): Unit = {
    val hc = s.sparkContext.hadoopConfiguration
    settings.foreach { case (k, v) => hc.set(k, v) }
  }
}
