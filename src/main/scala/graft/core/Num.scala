package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-safe numeric helpers.
  *
  * The correctness gate hash-compares Spark results against DuckDB.
  * Raw double aggregation is order-dependent (FP addition is not
  * associative), so any `sum(double)` can differ in the last bits
  * between engines. Rule used across all oracle-checked queries:
  * convert to integer units (cents / micros) first, aggregate exactly
  * on longs, and allow at most one final IEEE division (long/long ->
  * double is deterministic and identical across engines).
  */
object Num {
  /** Money double -> exact integer cents. `round` first so the
    * subsequent cast is on an integral double (Spark casts truncate,
    * DuckDB casts round — identical only after round). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** DuckDB spelling of [[cents]] — keep in lock-step. */
  def centsSql(expr: String): String =
    s"CAST(round(($expr)*100,0) AS BIGINT)"

  /** DuckDB `sum(BIGINT)` returns HUGEINT (int128) where Spark returns
    * long; wrap every integer SUM on the oracle side so both sides
    * land as int64 in the driver's comparator. */
  def sumSql(expr: String): String = s"CAST(sum($expr) AS BIGINT)"
}
