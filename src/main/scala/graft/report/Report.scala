package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full report lifecycle (reference report_generator.py:21-431,
  * SURVEY §3.1 step 5), config-driven over one cached runs frame:
  *
  *   invalidator purge -> duplicate-container purge -> tenancy
  *   enrichment -> raw section -> per-category group sections ->
  *   per-group raw dumps.
  *
  * The reference re-iterates its in-memory run list once per section;
  * here the input is cached once and every section is an independent
  * action over it (SURVEY §4 multi-pass note).
  */
object Report {

  case class Sections(
      raw: DataFrame,
      successfulRuns: Long,
      groups: Map[String, DataFrame],
      rawOfGroups: Map[String, DataFrame])

  def build(
      runs: DataFrame,
      spec: ExperimentSpec,
      idCol: Option[String] = None,
      attrCol: Option[String] = None): Sections = {

    var df = RunRecords.invalidatorFilter(runs, spec.invalidators)
    if (spec.removeDuplicateContainers && idCol.isDefined)
      df = df.dropDuplicates(idCol.get)
    for (id <- idCol; attr <- attrCol)
      df = Tenancy.enrich(df, id, attr)
    df = RunRecords.prune(df, spec.ignoreFromAll)
    df.cache()

    val raw = RunRecords.sortedColumns(df)
    val groups = spec.normalizedGroups(df.columns.toSet)
      .filter(df.columns.contains)
      .map { cat =>
        cat -> Groups.section(
          RunRecords.prune(df, spec.ignoreFromGroups ++
            spec.ignoreByGroup.getOrElse(cat, Set.empty)),
          spec.groupConfig(cat))
      }.toMap
    val rawDumps = spec.outputRawOfGroup
      .filter(df.columns.contains)
      .map(cat => cat -> df.orderBy(col(cat)))
      .toMap
    Sections(raw, df.count(), groups, rawDumps)
  }
}
