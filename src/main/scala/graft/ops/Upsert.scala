package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Apply-changes merge (MERGE/upsert): fold a changes frame — upserted
  * rows plus delete tombstones — into a base snapshot. Core Spark has
  * no MERGE INTO (that's a table-format feature); the engine-level
  * semantics are one full-outer equi-join on the key:
  *
  *  - key only in base            -> base row survives
  *  - key in changes, not deleted -> the change row REPLACES the base
  *    row wholesale (row-wise override: a null cell in a change row
  *    means "set null", not "keep the base value")
  *  - key in changes, deleted     -> dropped
  *
  * Scale: the join shuffles on the merge key; a small changes side
  * broadcasts (the common incremental case), and snapshot+changes
  * bucketed on the key merge with no exchange at all (LayoutSpec shows
  * the bucketed-join plan shape). Keys must be unique per side —
  * enforce upstream with first-wins dedup.
  */
object Upsert {

  /** The numeric TYPE-WIDENING lattice (the Delta type-widening
    * surface): two types reconcile to the wider one when the widening
    * is value-preserving — integral chain byte < short < int < long,
    * fractional float < double, and integral→double for mixes.
    * Anything else (narrowing, string/numeric mixes) has no safe
    * automatic reconciliation and returns None — refuse loudly, never
    * truncate silently. */
  def widen(a: DataType, b: DataType): Option[DataType] = {
    val intRank = Map[DataType, Int](ByteType -> 1, ShortType -> 2,
      IntegerType -> 3, LongType -> 4)
    val fracRank = Map[DataType, Int](FloatType -> 1, DoubleType -> 2)
    (a, b) match {
      case (x, y) if x == y => Some(x)
      case (x, y) if intRank.contains(x) && intRank.contains(y) =>
        Some(if (intRank(x) >= intRank(y)) x else y)
      case (x, y) if fracRank.contains(x) && fracRank.contains(y) =>
        Some(if (fracRank(x) >= fracRank(y)) x else y)
      case (x, y) if (intRank.contains(x) && fracRank.contains(y)) ||
          (fracRank.contains(x) && intRank.contains(y)) =>
        Some(DoubleType)
      case _ => None
    }
  }

  /** The widened common schema of two frames' SHARED columns (by
    * name; columns on one side only pass through untouched — that is
    * the accretion path, not widening). Refuses a column pair the
    * lattice can't reconcile. */
  def widenedSchema(a: StructType, b: StructType): Map[String, DataType] = {
    val bt = b.fields.map(f => f.name -> f.dataType).toMap
    a.fields.flatMap { f =>
      bt.get(f.name).map { other =>
        f.name -> widen(f.dataType, other).getOrElse(
          throw new IllegalArgumentException(
            s"column ${f.name}: no safe widening between " +
              s"${f.dataType.simpleString} and ${other.simpleString}"))
      }
    }.toMap
  }

  /** [[applyChanges]] with TYPE-WIDENING reconciliation: when the
    * changes arrive in wider types than the base (the upstream
    * widened a counter to long, a score to double — the Delta
    * type-widening evolution), both sides cast to the widened common
    * schema BEFORE the merge, so the result carries the wide types
    * and no value is ever narrowed. A non-reconcilable column refuses
    * loudly. */
  def applyChangesWidened(
      base: DataFrame, changes: DataFrame,
      key: String, deleteCol: String): DataFrame = {
    val target = widenedSchema(base.schema,
      StructType(changes.schema.filterNot(_.name == deleteCol)))
    def cast(df: DataFrame): DataFrame =
      df.select(df.columns.map(c => target.get(c)
        .map(t => col(c).cast(t).as(c)).getOrElse(col(c))): _*)
    applyChanges(cast(base), cast(changes), key, deleteCol)
  }

  def applyChanges(
      base: DataFrame, changes: DataFrame,
      key: String, deleteCol: String): DataFrame = {
    val dataCols = base.columns.filterNot(_ == key).toSeq
    val b = base.select(col(key) +:
      dataCols.map(c => col(c).as(s"_b_$c")): _*)
    val c = changes.select(col(key) +: lit(true).as("_in_changes") +:
      coalesce(col(deleteCol), lit(false)).as("_del") +:
      dataCols.map(n => col(n).as(s"_c_$n")): _*)
    b.join(c, Seq(key), "full_outer")
      .filter(!coalesce(col("_del"), lit(false)))
      .select(col(key) +: dataCols.map(n =>
        when(coalesce(col("_in_changes"), lit(false)), col(s"_c_$n"))
          .otherwise(col(s"_b_$n")).as(n)): _*)
  }
}
