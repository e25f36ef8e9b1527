package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a frame — the
  * constraint-check pass a production pipeline runs before promoting
  * a dataset (null counts, domain ranges, uniqueness, referential
  * integrity), reported as one row per rule with violation counts.
  *
  * Scale shape: every ROW-level rule compiles to one conditional
  * counter inside a SINGLE aggregate pass over the frame (no
  * per-rule scans); uniqueness adds one hash aggregate on its key;
  * a foreign-key check adds one left-anti join against the
  * (broadcastable) dimension. Nothing collects beyond the k-row
  * report.
  */
object Quality {

  sealed trait Rule { def name: String }
  /** Violation = predicate false (nulls count as violations). */
  case class Expect(name: String, predicate: Column) extends Rule
  /** Violation = any row beyond the first per key tuple. */
  case class Unique(name: String, cols: Seq[String]) extends Rule
  /** Violation = child value absent from the parent key column
    * (null children pass, like SQL FKs). */
  case class InParent(name: String, childCol: String,
      parent: DataFrame, parentCol: String) extends Rule

  /** One row per rule: (rule, violations, total, pass). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique — results are keyed by name")
    val s = df.sparkSession
    import s.implicits._

    // the row count rides the same single aggregate pass as the
    // row-level rules — no separate count() scan of the frame
    val expects = rules.collect { case e: Expect => e }
    val counters = count(lit(1)).as("_total") +: expects.map(e =>
      sum(when(coalesce(e.predicate, lit(false)), 0L).otherwise(1L))
        .as(e.name))
    val row = df.agg(counters.head, counters.tail: _*).collect()(0)
    val total = row.getLong(0)
    val expectRows: Seq[(String, Long)] =
      expects.zipWithIndex.map { case (e, i) =>
        e.name -> (if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1))
      }
    val uniqueRows: Seq[(String, Long)] = rules.collect { case u: Unique =>
      val dupes = df.groupBy(u.cols.map(col): _*)
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .agg(coalesce(sum(col("n") - 1), lit(0L))).collect()(0).getLong(0)
      u.name -> dupes
    }
    val fkRows: Seq[(String, Long)] = rules.collect { case f: InParent =>
      val orphans = df.filter(col(f.childCol).isNotNull)
        .join(f.parent.select(col(f.parentCol).as(f.childCol)).distinct(),
          Seq(f.childCol), "left_anti")
        .count()
      f.name -> orphans
    }

    val byName = (expectRows ++ uniqueRows ++ fkRows).toMap
    rules.map { r =>
      val v = byName(r.name)
      (r.name, v, total, v == 0L)
    }.toDF("rule", "violations", "total", "pass")
  }
}
