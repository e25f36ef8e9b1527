package graft

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import graft.runner.InvokeSource
import graft.streaming.EventStream

/** S9 invocation source against a real (local) HTTP endpoint: the
  * reference caller's post-processor semantics, the `version`
  * validity gate, bounded retries, and records flowing into the
  * report plan. Plus the F14 `.progress.txt` byte-format twin.
  */
class InvokeSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(route: HttpExchange => (Int, String))(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.createContext("/fn", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, resp) = route(ex)
        val bytes = resp.getBytes("UTF-8")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/fn")
    finally server.stop(0)
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), "UTF-8")

  test("invoke: post-processor semantics match the reference caller") {
    withServer { ex =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val in = mapper.readTree(readBody(ex))
      val id = in.get("id").asLong()
      (200, s"""{"version":42,"runtime":"7","cpuType":"Intel(R) Xeon","cpuModel":"63","note":"a,b\tc"}""")
    } { endpoint =>
      val payloads = (0L until 20L)
        .map(i => s"""{"id":$i}""").toDF("payload").repartition(2)
      val recs = InvokeSource.records(spark,
        InvokeSource.invoke(payloads, endpoint))
      assert(recs.count() === 20L)
      val cols = recs.columns.toSet
      assert(Set("1_run_id", "2_thread_id", "version", "roundTripTime",
        "latency", "cpuType", "payload", "zAll", "endpoint")
        .subsetOf(cols))
      val r = recs.head()
      def v(c: String) = r.getString(recs.columns.indexOf(c))
      // cpuType merged with model, comma/tab sanitized
      assert(v("cpuType") === "Intel(R) Xeon - Model 63")
      assert(v("note") === "a;b\\tc")
      assert(v("zAll") === "Final Results:")
      // latency = rtt - int(runtime), two decimals (negative when the
      // reported runtime exceeds wall time, exactly like the reference)
      assert(math.abs(v("latency").toDouble -
        (v("roundTripTime").toDouble - 7.0)) < 0.011)
      // both partitions acted as caller threads; run ids restart per thread
      assert(recs.select("2_thread_id").distinct().count() === 2L)
      assert(recs.filter(col("1_run_id") === "0").count() === 2L)
      // records flow into the report plan unchanged
      val grouped = graft.report.RunRecords.sortedColumns(recs)
        .groupBy(col("cpuType")).agg(count(lit(1)).as("uses"))
      assert(grouped.head().getLong(1) === 20L)
    }
  }

  test("invoke: version validity gate drops invalid runs; bounded retries recover transients") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { ex =>
      val body = readBody(ex)
      if (body.contains("\"mode\":\"invalid\""))
        (200, """{"ok":true}""") // no version -> not a record
      else if (body.contains("\"mode\":\"flaky\"")) {
        // first two attempts fail, third lands
        if (hits.incrementAndGet() <= 2) (500, "boom")
        else (200, """{"version":42,"runtime":"1"}""")
      } else (200, """{"version":42,"runtime":"1"}""")
    } { endpoint =>
      val payloads = Seq(
        """{"mode":"ok"}""", """{"mode":"invalid"}""",
        """{"mode":"flaky"}""").toDF("payload").coalesce(1)
      val recs = InvokeSource.invoke(payloads, endpoint,
        maxAttempts = 3).collect()
      // invalid dropped; ok + flaky (after retries) survive
      assert(recs.length === 2)
      assert(hits.get() === 3)
    }
  }

  test("progress file: python-round byte format") {
    assert(EventStream.progressPercent(50, 200) === 25)
    assert(EventStream.progressPercent(1, 8) === 12)   // 12.5 -> even 12
    assert(EventStream.progressPercent(3, 8) === 38)   // 37.5 -> even 38
    assert(EventStream.progressPercent(200, 200) === 100)
    val f = java.nio.file.Files.createTempDirectory("graft_prog")
      .resolve(".progress.txt")
    EventStream.writeProgressFile(f, 94, 200)
    assert(new String(java.nio.file.Files.readAllBytes(f), "UTF-8") === "47")
  }
}
