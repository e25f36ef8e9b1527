package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1-S6: reader/writer wrappers with reference option parity.
  *
  * The reference's CSV parser splits on bare commas with no
  * quoting/escaping (Transform.java:123, 245); `quote=""` disables
  * Spark's quote handling for byte parity. The JDBC sink mirrors the
  * 100-row `executeBatch` of LoadData.java:135.
  */
object CsvIO {

  /** S1: header CSV scan, no-quote mode, optional explicit schema
    * (P18 typed ingest). */
  def readCsv(s: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = s.read.option("header", "true").option("quote", "")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** S3: header CSV sink, no-quote mode. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").option("quote", "")
      .csv(path)

  /** S5: JSON-directory scan — one record per file, schema unioned
    * across files (the reference's report_from_folder). */
  def readJsonDir(s: SparkSession, dir: String): DataFrame = s.read.json(dir)

  /** S6: JSON-per-record sink. */
  def writeJson(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  /** S4: JDBC batch-insert sink (batchsize 100 = LoadData.java:135).
    * Untestable in this container (no database); thin declarative
    * wrapper only. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      user: String, password: String, batchSize: Int = 100): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      .mode("append")
      .save()

  /** Columnar interchange beyond parquet: ORC read/write (bundled
    * with Spark; same pushdown/pruning machinery). A reference user
    * landing data in either columnar format round-trips through the
    * same engine surface. */
  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** XML interchange (Spark 4's native `xml` source): row-per-rowTag
    * scan and sink — rounding out the text-interchange surface next
    * to CSV (S1/S3) and JSON (S5/S6), with the same split planning
    * and schema inference machinery. */
  def readXml(s: SparkSession, path: String, rowTag: String): DataFrame =
    s.read.format("xml").option("rowTag", rowTag).load(path)

  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.format("xml")
      .option("rowTag", rowTag)
      .option("rootTag", s"${rowTag}s")
      .mode("overwrite")
      .save(path)

  /** S11/Q: the TLQ Query surface — SQL over a registered table. */
  def query(s: SparkSession, df: DataFrame, table: String, sql: String): DataFrame = {
    df.createOrReplaceTempView(table)
    s.sql(sql)
  }
}
