package graft

import java.nio.file.Files
import graft.etl.SalesTransform
import graft.sources.CsvIO

/** S4 (JDBC batch-insert sink, batchsize 100) + S11 (SQL scan of the
  * loaded table) against embedded Derby — the same `format("jdbc")`
  * path a MySQL `TLQ.SalesData` deployment uses. */
class JdbcSpec extends SparkSpec {

  test("TLQ Load: JDBC batch sink + scan round-trip") {
    val dbDir = Files.createTempDirectory("graft_derby").resolve("tlq")
    val url = s"jdbc:derby:$dbDir;create=true"
    val out = SalesTransform.transformed(spark, sf)
      .select("order_id", "region", "order_priority", "processing_days",
        "revenue_c")
    out.write.format("jdbc")
      .option("url", url)
      .option("dbtable", "SalesData")
      .option("batchsize", 100)
      .mode("overwrite")
      .save()
    val back = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "SalesData")
      .load()
    assert(back.count() === out.count())
    val q = CsvIO.query(spark, back, "SalesDataJdbc",
      """SELECT region, count(*) AS n FROM SalesDataJdbc
        |GROUP BY region ORDER BY region""".stripMargin)
    assert(q.count() === 5)
  }
}
