package graft.runner

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.report.{ExperimentSpec, Report}
import graft.sources.{CsvIO, ReportWriter}

/** The reference's standalone compile-results tool
  * (test/compile_results.py:53-72): a folder of per-run JSON records
  * plus an experiment JSON file in, one
  * `compiled-results-<experiment>.csv` multi-section report out.
  * The folder scan is the S5 JSON-directory source (schema unioned
  * across files, executor-side); the report path is the same
  * distributed [[Report]]/[[ReportWriter]] lifecycle every other
  * entry uses.
  */
object CompileResults {

  def run(s: SparkSession, folder: String, experimentJsonPath: String): String = {
    val expName = Paths.get(experimentJsonPath).getFileName.toString
      .stripSuffix(".json")
    val spec = ExperimentSpec.fromJson(
      Files.readString(Paths.get(experimentJsonPath)))
    val runs = CsvIO.readJsonDir(s, folder)
    val sections = Report.build(runs, spec)
    ReportWriter.writeReport(
      folder, s"compiled-results-$expName", spec.experimentName, sections)
  }
}
