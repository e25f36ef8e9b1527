package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
