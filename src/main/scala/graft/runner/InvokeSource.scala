package graft.runner

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S9: the SCALE-OUT INVOCATION SOURCE — the reference's FaaS
  * fan-out (`test/tools/experiment_caller.py:29-76` `callHTTP` +
  * `:80-130` `callPostProcessor`) re-expressed as a distributed
  * source: a Dataset of JSON payloads, `mapPartitions` posting each
  * to the endpoint, response records flowing straight into the
  * report plan ([[graft.report.RunRecords.unionFill]] et al.). Each
  * PARTITION plays one caller thread (the reference's `callThread`:
  * partition id = `2_thread_id`, index-in-partition = `1_run_id`),
  * so invocation concurrency is cluster parallelism — repartition
  * the payloads to choose the thread count, at any scale.
  *
  * Reference post-processor semantics, preserved exactly:
  *  - POST with `content-type: application/json`, response text
  *    parsed as a JSON object (a non-object response → failed run →
  *    dropped, the `except → {}` path);
  *  - `roundTripTime` = wall millis rounded to 2 decimals
  *    (`round((t1-t0)*100000)/100`);
  *  - `latency = round(roundTripTime - int(runtime), 2)` when the
  *    response carries `runtime`;
  *  - `cpuType = cpuType + " - Model " + cpuModel` when both exist;
  *  - `payload` echoes the request; `zAll` marks the record;
  *  - VALIDITY GATE: only responses containing `version` become
  *    records (`experiment_caller.py:101`) — anything else is an
  *    invalid run and emits nothing;
  *  - value sanitization `,`→`;`, tab→`\t`, newline→`\n` on every
  *    value (the report-CSV contract).
  *
  * Engine addition (the reference CLI has none): BOUNDED RETRIES
  * with linear backoff per call — at 10⁵ concurrent invocations
  * transient connect resets are certain, and one lost call poisons a
  * whole run-set's aggregate with the sentinel fill.
  *
  * Output: one JSON record per VALID call (all values strings, the
  * reference's stringify). `records` parses them into a typed frame
  * whose schema is the key union — ready for the report operators.
  */
object InvokeSource {

  /** One partition's HTTP loop. Lives in an object so the closure
    * serializes cleanly; the client is per-partition (keep-alive
    * within a partition's call sequence, like one caller thread's
    * session). */
  private def callPartition(endpoint: String, timeoutMs: Long,
      maxAttempts: Int, threadId: Int,
      payloads: Iterator[String]): Iterator[String] = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs)).build()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // FaaS responses carry raw tabs/newlines inside values (that is
    // WHY the reference sanitizes them); its `ast.literal_eval`
    // tolerates control chars, so the parser here must too
    mapper.configure(com.fasterxml.jackson.core.JsonParser.Feature
      .ALLOW_UNQUOTED_CONTROL_CHARS, true)
    payloads.zipWithIndex.flatMap { case (payload, runId) =>
      val t0 = System.nanoTime()
      val body = postWithRetry(client, endpoint, payload, timeoutMs,
        maxAttempts)
      val rttMs = math.rint((System.nanoTime() - t0) / 1e9 * 100000) / 100
      body.flatMap(postProcess(mapper, endpoint, _, threadId, runId,
        payload, rttMs))
    }
  }

  private def postWithRetry(client: HttpClient, endpoint: String,
      payload: String, timeoutMs: Long,
      maxAttempts: Int): Option[String] = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val req = HttpRequest.newBuilder(URI.create(endpoint))
          .timeout(Duration.ofMillis(timeoutMs))
          .header("content-type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(payload)).build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) return Some(resp.body())
        // non-2xx: retryable server trouble, fall through to backoff
      } catch {
        case _: java.io.IOException => // connect reset / timeout
        case _: InterruptedException => return None
      }
      if (attempt < maxAttempts) Thread.sleep(50L * attempt)
    }
    None
  }

  /** `callPostProcessor` (experiment_caller.py:80-130): returns the
    * sanitized record JSON, or None for an invalid run. */
  private def postProcess(
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      endpoint: String, responseText: String, threadId: Int,
      runId: Int, payload: String, rttMs: Double): Option[String] = {
    val node = try mapper.readTree(responseText)
      catch { case _: Exception => return None }
    if (node == null || !node.isObject) return None
    val obj = node.asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    // the validity gate: no `version`, no record
    if (!obj.has("version")) return None
    val dict = scala.collection.mutable.LinkedHashMap.empty[String, String]
    obj.fields().asScala.foreach { e =>
      dict(e.getKey) =
        if (e.getValue.isTextual) e.getValue.asText else e.getValue.toString
    }
    dict("2_thread_id") = threadId.toString
    dict("1_run_id") = runId.toString
    dict("zAll") = "Final Results:"
    dict("roundTripTime") = fmtNum(rttMs)
    dict("payload") = payload
    if (dict.contains("runtime"))
      scala.util.Try(dict("runtime").toDouble.toLong).foreach { rt =>
        dict("latency") = fmtNum(math.rint((rttMs - rt) * 100) / 100)
      }
    if (dict.contains("cpuType") && dict.contains("cpuModel"))
      dict("cpuType") = dict("cpuType") + " - Model " + dict("cpuModel")
    if (!dict.contains("platform")) dict("endpoint") = endpoint
    val out = mapper.createObjectNode()
    dict.foreach { case (k, v) =>
      out.put(k, v.replace(",", ";").replace("\t", "\\t")
        .replace("\n", "\\n"))
    }
    Some(mapper.writeValueAsString(out))
  }

  /** Integral doubles print bare (the Python `round` rendering:
    * 123.0 → "123.0" in Python — but the reference stringifies with
    * str(), keeping one decimal; non-integral keep their decimals). */
  private def fmtNum(d: Double): String =
    if (d == math.rint(d)) s"${d.toLong}.0" else d.toString

  /** Fan the payloads out: one HTTP POST per row, records back as
    * JSON strings (invalid runs dropped). `payloads` must have a
    * string column named `payload`. */
  def invoke(payloads: DataFrame, endpoint: String,
      timeoutMs: Long = 450000L, maxAttempts: Int = 3): Dataset[String] = {
    val s = payloads.sparkSession
    import s.implicits._
    payloads.select("payload").as[String].mapPartitions { it =>
      val tid = org.apache.spark.TaskContext.getPartitionId()
      callPartition(endpoint, timeoutMs, maxAttempts, tid, it)
    }
  }

  /** Invocation records as a typed frame — schema = key union across
    * records (all strings, the reference's stringify), ready for the
    * report plan's sentinel fill / grouping. */
  def records(s: SparkSession, jsons: Dataset[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val keys = jsons // key union: tiny driver set, O(distinct keys)
      .flatMap { j =>
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        m.readTree(j).fieldNames().asScala.toSeq
      }(org.apache.spark.sql.Encoders.STRING)
      .distinct().collect().sorted
    val schema = StructType(keys.map(StructField(_, StringType)))
    s.read.schema(schema).json(jsons)
  }
}
