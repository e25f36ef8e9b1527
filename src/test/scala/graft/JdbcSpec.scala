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

  test("S4 MySQL dialect: Load-stage DDL and INSERT SQL (db.properties target)") {
    import org.apache.spark.sql.graftbridge.Bridge
    // the reference's Load stage writes MySQL TLQ.SalesData
    // (LoadData.java:131-133, db.properties-empty:4-8); no MySQL
    // server ships in this container, so pin the dialect-dispatched
    // SQL Spark would issue for that URL — the half of S4 the Derby
    // round-trip (same format("jdbc") path) cannot witness
    val url = "jdbc:mysql://dbhost:3306/TLQ"
    val schema = SalesTransform.transformed(spark, sf)
      .select("order_id", "region", "order_priority", "processing_days",
        "revenue_c").schema
    val ddl = Bridge.jdbcSchemaString(url, schema)
    // MySQL dialect: backtick identifier quoting, LONGTEXT strings
    assert(ddl.contains("`order_id` BIGINT"), ddl)
    assert(ddl.contains("`region` LONGTEXT"), ddl)
    assert(ddl.contains("`order_priority` LONGTEXT"), ddl)
    assert(ddl.contains("`revenue_c` BIGINT"), ddl)
    val ins = Bridge.jdbcInsertStatement(url, "TLQ.SalesData", schema)
    assert(ins.startsWith("INSERT INTO TLQ.SalesData"), ins)
    assert(ins.contains("`region`"), ins)
    assert(ins.count(_ == '?') === schema.length, ins)
    // same schema through the Derby dialect quotes with ANSI doubles —
    // the dialect dispatch itself is what's under test
    val derby = Bridge.jdbcSchemaString("jdbc:derby:memory:x", schema)
    assert(derby.contains("\"order_id\" BIGINT"), derby)
  }
}
