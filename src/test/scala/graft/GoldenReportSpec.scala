package graft

import java.nio.file.{Files, Paths}
import graft.report.Groups

/** F4 golden regression oracle (SURVEY §5): ingest the raw section of
  * the reference's checked-in example report and reproduce its
  * aggregate row exactly (test/history/exampleOutput.csv:15-17,
  * config test/reports/exampleReport.json).
  */
class GoldenReportSpec extends SparkSpec {

  private val goldenPath = "/root/reference/test/history/exampleOutput.csv"

  test("reproduces the reference example report's cpuType aggregates") {
    assume(Files.exists(Paths.get(goldenPath)), "reference not present")
    val lines = Files.readAllLines(Paths.get(goldenPath))
    val start = lines.indexOf("Raw results of each run:") + 1
    val end = (start until lines.size())
      .find(i => lines.get(i).startsWith("Successful Runs")).get
    val tmp = Files.createTempDirectory("golden")
    val raw = tmp.resolve("raw.csv")
    Files.write(raw, lines.subList(start, end))

    val df = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(raw.toString)
    assert(df.count() === 7)

    // exampleReport.json config for the cpuType section
    val cfg = Groups.GroupConfig(
      category = "cpuType",
      showAsSum = Set("newcontainer"),
      showAsList = Set("vmuptime", "cpuType", "endpoint", "containerID", "vmID"),
      ignore = Set("zAll", "lang", "version", "linuxVersion", "platform",
        "hostname", "1_run_id", "2_thread_id", "cpuModel", "cpuIdle",
        "cpuIowait", "cpuIrq", "cpuKrn", "cpuNice", "cpuSoftIrq", "cpuUsr",
        "cpuType"))
    val section = Groups.section(df, cfg)
    val row = section.collect()(0)
    def get(c: String): Any = row.get(row.fieldIndex(c))

    // golden values from exampleOutput.csv:17
    assert(get("uses") === 7L)
    assert(get("avg_runtime") === 585.79)
    assert(get("avg_roundTripTime") === 3855.00)
    assert(get("avg_latency") === 3269.86)
    assert(get("avg_frameworkRuntime") === 460.04)
    assert(get("avg_cpuKrnDelta") === 14.57)
    assert(get("avg_cpuUsrDelta") === 45.43)
    assert(get("avg_cpuSoftIrqDelta") === 0.29)
    assert(get("avg_cpuIdleDelta") === 0.00)
    assert(get("avg_vmcpusteal") === 0.00)
    assert(get("sum_newcontainer") === 0L)
    assert(get("vmuptime_list") === "1572408278")
    // reference column order: aggs interleaved by base-name sort
    val cols = section.columns.toSeq
    assert(cols.indexOf("avg_latency") < cols.indexOf("sum_newcontainer"))
    assert(cols.indexOf("sum_newcontainer") < cols.indexOf("avg_roundTripTime"))
  }
}
