package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for ADDITIVE aggregates
  * (count / sum — and anything rebuilt from them): fold a delta
  * partition's pre-aggregated contribution into the standing MV with
  * one full-outer join on the key, never rescanning the history that
  * produced the MV. This is the nightly-refresh primitive at 100 TB:
  * the join's left side is bounded by KEY CARDINALITY (the MV), the
  * right by one partition's keys — the 99 already-integrated
  * partitions are never read again. Keys absent from the delta pass
  * through; keys new in the delta enter with a zero base.
  *
  * Correctness rests on additivity alone, so `q_incremental_mv`
  * hash-gates the incrementally-maintained MV against the oracle's
  * FULL recompute — the two must be identical, not approximately so.
  */
object Mv {

  /** Merge `delta` (same schema: key + additive long columns) into
    * `base`. Both sides must be unique per key (they are aggregate
    * states). A NULL state is preserved, not zero-coerced: sum-states
    * are NULL exactly when every contributing input was NULL, and
    * sum(A ∪ B) is NULL only if both halves are — so the merge
    * coalesces to 0 only when at least one side carries a real value,
    * keeping bit-identity with the full recompute for general states
    * (a key absent from one side contributes nothing either way). */
  def additiveMerge(base: DataFrame, delta: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    val b = base.select(col(key) +: cols.map(c => col(c).as(s"_b_$c")): _*)
    val d = delta.select(col(key) +: cols.map(c => col(c).as(s"_d_$c")): _*)
    b.join(d, Seq(key), "full_outer")
      .select(col(key) +: cols.map { c =>
        val (bv, dv) = (col(s"_b_$c"), col(s"_d_$c"))
        when(bv.isNull && dv.isNull, lit(null).cast("long"))
          .otherwise(coalesce(bv, lit(0L)) + coalesce(dv, lit(0L)))
          .as(c)
      }: _*)
  }
}
