package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's distribution-comparison statistics (the remaining
  * IC2E Data.csv columns beside MAPE: `tStat`/`pValue` and
  * `wassersteinDistance` — how SAAF decides whether two scenarios'
  * runtime distributions differ), engine-grade:
  *
  *  - WELCH'S T: computed from exact integer moments (n, Σy, Σy² per
  *    side — one map-side-combined aggregate), with the variance
  *    numerator kept integral (`n·Σy² − (Σy)²`) so the only floating
  *    arithmetic is a FIXED tree of IEEE ops over exact integers —
  *    bit-identical in any engine that writes the same tree (the
  *    one-final-division discipline of [[graft.core.Num]], extended
  *    to a handful of ops). The significance verdict uses the
  *    large-sample normal threshold (|t| > 1.96 ≈ p < 0.05) — the
  *    t-CDF itself is not SQL-replayable, the decision is.
  *  - 1-D WASSERSTEIN (earth-mover): `W1 = ∫|F1−F2| dx` over the
  *    merged empirical CDFs, EXACT: per distinct value, cumulative
  *    counts scale-free as `|c1·n2 − c2·n1|`, times the gap to the
  *    next value, summed as decimals and floor-divided by `n1·n2` —
  *    integer end to end, replayable as window SQL.
  *
  * Scale: both reduce per (key, side) — the t-test to six integers
  * per key, the W1 to one ordered pass over (key, distinct-value)
  * rows (the per-key window sort IS the algorithm; its width is
  * value cardinality, never raw rows, after the count pre-aggregate).
  */
object Stats {

  /** Per-key Welch t between `sideCol` ∈ {0, 1} populations of the
    * LONG `valueCol`: (key, n0, n1, t_ppm, significant).
    * `t_ppm = round(t·10⁶)` with t from the fixed IEEE tree
    * `(m0−m1)/sqrt(v0/n0 + v1/n1)`, `m = sy/n`,
    * `v = (n·syy − sy²) / (n·(n−1))` — every input an exact integer. */
  def welchT(df: DataFrame, valueCol: String, sideCol: String,
      keyCol: String): DataFrame =
    df.groupBy(col(keyCol), col(sideCol).as("_side"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,0)")).as("sy"),
        sum((col(valueCol) * col(valueCol)).cast("decimal(38,0)"))
          .as("syy"))
      .groupBy(col(keyCol))
      .agg(
        max(when(col("_side") === 0, col("n"))).as("n0"),
        max(when(col("_side") === 0, col("sy"))).as("sy0"),
        max(when(col("_side") === 0, col("syy"))).as("syy0"),
        max(when(col("_side") === 1, col("n"))).as("n1"),
        max(when(col("_side") === 1, col("sy"))).as("sy1"),
        max(when(col("_side") === 1, col("syy"))).as("syy1"))
      .withColumn("t_dbl", expr(
        """(CAST(sy0 AS DOUBLE) / n0 - CAST(sy1 AS DOUBLE) / n1) /
          |sqrt(CAST(n0 * syy0 - sy0 * sy0 AS DOUBLE) / (n0 * (n0 - 1)) / n0
          |   + CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE) / (n1 * (n1 - 1)) / n1)
          |""".stripMargin.replace("\n", " ")))
      .select(col(keyCol), col("n0"), col("n1"),
        expr("CAST(round(t_dbl * 1000000, 0) AS BIGINT)").as("t_ppm"),
        (abs(col("t_dbl")) > lit(1.96d)).cast("long").as("significant"))

  /** Per-key exact 1-D Wasserstein distance between the two
    * `sideCol` ∈ {0, 1} populations of LONG `valueCol`, floored to
    * value units: (key, n0, n1, w1). */
  def wasserstein1(df: DataFrame, valueCol: String, sideCol: String,
      keyCol: String): DataFrame = {
    val perV = df.groupBy(col(keyCol), col(valueCol).as("v"))
      .agg(sum(when(col(sideCol) === 0, 1L).otherwise(0L)).as("d0"),
        sum(when(col(sideCol) === 1, 1L).otherwise(0L)).as("d1"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("v"))
    perV
      .withColumn("c0", sum(col("d0")).over(w))
      .withColumn("c1", sum(col("d1")).over(w))
      .withColumn("gap", lead(col("v"), 1).over(w) - col("v"))
      .withColumn("n0", sum(col("d0")).over(Window.partitionBy(col(keyCol))))
      .withColumn("n1", sum(col("d1")).over(Window.partitionBy(col(keyCol))))
      .withColumn("term",
        // decimal BEFORE the gap product: |c·n| ≤ rows², the ×gap
        // product would overflow long at large value ranges
        abs(col("c0") * col("n1") - col("c1") * col("n0"))
          .cast("decimal(38,0)") * coalesce(col("gap"), lit(0L)))
      .groupBy(col(keyCol))
      .agg(max(col("n0")).as("n0"), max(col("n1")).as("n1"),
        sum(col("term")).as("sterm"))
      .withColumn("w1", expr("sterm DIV (n0 * n1)"))
      .select(col(keyCol), col("n0"), col("n1"), col("w1"))
  }
}
