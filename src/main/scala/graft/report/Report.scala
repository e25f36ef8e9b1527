package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.CacheScope.Scoped

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

  /** @param arrivalCol ingest-order column for the duplicate-container
    *   purge: the reference keeps the FIRST run per container in
    *   arrival order (report_generator.py:209-213), so P13 needs a
    *   total order — pass the run/event sequence id. Without one, the
    *   pick falls back to a deterministic sort over the remaining
    *   columns (stable, but not arrival order). */
  def build(
      runs: DataFrame,
      spec: ExperimentSpec,
      idCol: Option[String] = None,
      attrCol: Option[String] = None,
      arrivalCol: Option[String] = None): Sections = {

    var df = RunRecords.invalidatorFilter(runs, spec.invalidators)
    if (spec.removeDuplicateContainers && idCol.isDefined) {
      val order = arrivalCol.map(Seq(_)).getOrElse(
        (df.columns.toSet - idCol.get).toSeq.sorted)
      df = graft.etl.SalesTransform.dedupFirstWins(df, idCol.get, order)
    }
    for (id <- idCol; attr <- attrCol)
      df = Tenancy.enrich(df, id, attr)
    df = RunRecords.prune(df, spec.ignoreFromAll)
    df.scopedCache()

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
