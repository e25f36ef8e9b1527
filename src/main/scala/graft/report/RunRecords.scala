package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Run-record frame utilities (SURVEY §1.3, §2.2).
  *
  * The reference's report engine operates over dynamically-schemaed
  * "run records": the union of all keys across records, missing cells
  * filled with a poison sentinel (reference
  * test/tools/report_generator.py:78-87), columns emitted in sorted
  * name order (report_generator.py:177-182).
  */
object RunRecords {

  /** The reference's missing-value sentinel — deliberately poisons
    * sums/averages so absent metrics are visible in reports. */
  val Sentinel: Long = -999999999999L

  /** P11: union-of-keys schema merge + sentinel fill.
    * `unionByName(allowMissingColumns)` is the declarative form of the
    * reference's key-union loop; scales as a pure narrow op. */
  def unionFill(dfs: Seq[DataFrame], sentinel: Long = Sentinel): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true)).na.fill(sentinel)

  /** O1: columns in lexicographically sorted name order. */
  def sortedColumns(df: DataFrame): DataFrame =
    df.select(df.columns.sorted.map(col).toIndexedSeq: _*)

  /** P12: invalidator purge — drop a run when `str(run[k]) == str(v)`
    * for any configured k (reference report_generator.py:203-225).
    * Semantically an anti-join against a literal list; absent keys and
    * nulls never invalidate (mirrors the dict .get semantics). */
  def invalidatorFilter(df: DataFrame, invalidators: Map[String, String]): DataFrame =
    invalidators.foldLeft(df) { case (d, (k, v)) =>
      if (!d.columns.contains(k)) d
      else d.filter(coalesce(col(k).cast("string") =!= lit(v), lit(true)))
    }

  /** P16: warm-up purge — drop iterations below the buffer
    * (reference experiment_orchestrator.py:224-231). */
  def warmupFilter(df: DataFrame, iterationCol: String, warmupBuffer: Int): DataFrame =
    df.filter(col(iterationCol) >= warmupBuffer)

  /** P15: column pruning for a report scope. */
  def prune(df: DataFrame, ignore: Set[String]): DataFrame =
    df.drop(ignore.toSeq: _*)

  /** U1: iteration union — tag each frame with its iteration index and
    * derive `key[iteration]` ids (reference
    * experiment_orchestrator.py:222-237), then schema-union. */
  def combineIterations(dfs: Seq[DataFrame], idCol: String): DataFrame =
    unionFill(dfs.zipWithIndex.map { case (df, i) =>
      df.withColumn("iteration", lit(i))
        .withColumn(s"${idCol}_iter",
          concat(col(idCol).cast("string"), lit(s"[$i]")))
    })
}
