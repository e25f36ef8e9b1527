package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Config-driven grouped-aggregation engine (SURVEY §2.4 A1-A8).
  *
  * One hash group-by per configured category attribute; per group:
  * `uses` count, `avg_X` (rounded 2 — reference
  * report_generator.py:372-381), `sum_X` for `showAsSum`
  * (report_generator.py:363-371), `X_list` distinct-sorted
  * ';'-joined for `showAsList` (report_generator.py:352-362).
  *
  * Numeric-column detection deviates deliberately from the
  * reference's "first row parses as Decimal" probe
  * (report_generator.py:311-326): here it is schema-driven
  * (deterministic, plan-time) — documented in SURVEY §7.4.2.
  *
  * Scale: each section is a partial-aggregated hash groupBy; the only
  * shuffle moves one row per (category value x column), and
  * `collect_set` lists are bounded by the distinct-value count of the
  * listed column.
  */
object Groups {

  case class GroupConfig(
      category: String,
      showAsSum: Set[String] = Set.empty,
      showAsList: Set[String] = Set.empty,
      ignore: Set[String] = Set.empty,
      /** true = the reference's dynamic probe (first row's value must
        * parse as Decimal — report_generator.py:311-326); false = the
        * deterministic schema-driven detection (default, SURVEY
        * §7.4.2). */
      probeNumerics: Boolean = false)

  /** A6, reference-faithful variant: a column counts as numeric when
    * the FIRST row's value parses as a decimal — string-typed numeric
    * columns are aggregated, mixed columns follow their first row.
    * One driver-side row fetch; the aggregation itself casts lazily. */
  def probedNumericColumns(df: DataFrame): Set[String] = {
    val first = df.limit(1).collect().headOption
    first match {
      case None => Set.empty
      case Some(row) =>
        df.columns.zipWithIndex.filter { case (_, i) =>
          row.get(i) match {
            case null => false
            case v => scala.util.Try(BigDecimal(v.toString)).isSuccess
          }
        }.map(_._1).toSet
    }
  }

  /** A5: distinct values, sorted, ';'-joined (CSV-text parity with
    * the reference's `,`->`;` escape). */
  def distinctSortedList(c: Column): Column =
    concat_ws(";", sort_array(collect_set(regexp_replace(c.cast("string"), ",", ";"))))

  def sectionAggs(df: DataFrame, cfg: GroupConfig): Seq[Column] = {
    val present = df.columns.toSet
    val numeric =
      if (cfg.probeNumerics) probedNumericColumns(df)
      else df.schema.fields
        .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    val excluded = cfg.ignore + cfg.category
    val avgCols = numeric -- cfg.showAsSum -- cfg.showAsList -- excluded
    val sumCols = cfg.showAsSum.intersect(present) -- excluded
    val listCols = cfg.showAsList.intersect(present) -- excluded
    // probe mode aggregates through try_cast: values that fail to
    // parse become null and drop out of avg/sum — the reference's
    // per-value try/except (report_generator.py:372-379)
    def num(c: String): Column =
      if (cfg.probeNumerics) expr(s"try_cast(`$c` AS double)") else col(c)
    // reference column order: aggregates interleaved in sorted order
    // of the UNDERLYING column name (report_generator.py:177-182)
    val aggs = (
      avgCols.map(c => c -> round(avg(num(c)), 2).as(s"avg_$c")) ++
      sumCols.map(c => c -> sum(num(c)).as(s"sum_$c")) ++
      listCols.map(c => c -> distinctSortedList(col(c)).as(s"${c}_list"))
    ).toSeq.sortBy(_._1).map(_._2)
    count(lit(1)).as("uses") +: aggs
  }

  /** A1-A8: one report section — grouped aggregate rows ordered by
    * category value (O2). */
  def section(df: DataFrame, cfg: GroupConfig): DataFrame = {
    val aggs = sectionAggs(df, cfg)
    df.groupBy(col(cfg.category))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col(cfg.category))
  }

  /** A7: `Total number of unique <cat>s`. */
  def distinctGroupCount(df: DataFrame, category: String): DataFrame =
    df.agg(countDistinct(col(category)).as("n_groups"))

  /** A8: per-group raw dump — every run of one group value, columns
    * sorted (reference report_generator.py:387-430). */
  def rawOfGroup(df: DataFrame, category: String, value: String): DataFrame =
    RunRecords.sortedColumns(df.filter(col(category).cast("string") === value))

  /** The multi-section report: one section per category over the same
    * cached input (the reference re-iterates the run list per
    * category; here the input is cached once and each section is an
    * independent aggregation — SURVEY §4). */
  def report(df: DataFrame, configs: Seq[GroupConfig]): Map[String, DataFrame] =
    configs.map(c => c.category -> section(RunRecords.prune(df, c.ignore), c)).toMap
}
