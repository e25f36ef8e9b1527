package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import graft.report.Report

/** S7: the multi-section CSV report sink + its splitter inverse
  * (reference report_generator.py:172-430 writer,
  * test/tools/report_splitter.py:27-40 section structure: sections
  * separated by blank lines).
  *
  * Sections are k-row aggregates by construction, so the driver-side
  * collect here is bounded by report size, never by input size — the
  * heavy computation stays distributed.
  */
object ReportWriter {

  private def esc(v: Any): String = v match {
    case null => ""
    case s => s.toString.replace(",", ";").replace("\t", "\\t").replace("\n", "\\n")
  }

  /** One section as CSV text: header row + data rows. */
  def sectionCsv(df: DataFrame): String = {
    val cols = df.columns
    val header = cols.mkString(",")
    val rows = df.collect().map(r =>
      cols.indices.map(i => esc(r.get(i))).mkString(","))
    (header +: rows).mkString("\n")
  }

  /** The reference's report layout: preamble, raw section, successful
    * run count, one titled section per category (with unique-count
    * footer), raw dumps — sections separated by blank lines. */
  def reportCsv(name: String, s: Report.Sections): String = {
    val sb = new StringBuilder
    sb.append(s"Report: $name\n\n")
    sb.append("Raw results of each run:\n")
    sb.append(sectionCsv(s.raw)).append("\n")
    sb.append(s"Successful Runs: ${s.successfulRuns}\n\n")
    s.groups.toSeq.sortBy(_._1).foreach { case (cat, df) =>
      sb.append(s"Category $cat:\n")
      sb.append(sectionCsv(df)).append("\n")
      sb.append(s"Total number of unique ${cat}s: ${df.count()}\n\n")
    }
    s.rawOfGroups.toSeq.sortBy(_._1).foreach { case (cat, df) =>
      sb.append(s"--- Runs of Group $cat ---\n")
      sb.append(sectionCsv(df)).append("\n\n")
    }
    sb.toString
  }

  /** Filename `-N` dedupe (reference report_generator.py:464-505):
    * never overwrite an existing report. */
  def write(dir: String, baseName: String, text: String): String = {
    Files.createDirectories(Paths.get(dir))
    var candidate = Paths.get(dir, s"$baseName.csv")
    var i = 0
    while (Files.exists(candidate)) {
      i += 1
      candidate = Paths.get(dir, s"$baseName-$i.csv")
    }
    Files.writeString(candidate, text)
    candidate.toString
  }

  /** Splitter inverse (report_splitter.py parity): break a report
    * back into blank-line-separated sections. */
  def split(text: String): Seq[String] =
    text.split("\n\\s*\n").toSeq.map(_.trim).filter(_.nonEmpty)
}
