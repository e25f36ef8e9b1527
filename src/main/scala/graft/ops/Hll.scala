package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashParity

/** Cross-engine-replayable HyperLogLog distinct-count sketch
  * (Flajolet et al. 2007; the m ≥ 128 bias constant from the same
  * paper, as restated in Heule et al. 2013 §2).
  *
  * Spark's own `approx_count_distinct` is HLL++ and survey-grade, but
  * its registers are not reproducible outside the JVM, so a result
  * carrying it can never be oracle-checked (the one remaining
  * test-only profiling surface before this file). This sketch is
  * built for the driver's DuckDB gate instead: every register value
  * derives from the md5 parity hash ([[HashParity.h60]]) and integer
  * arithmetic both engines evaluate identically, and the estimate is
  * ONE IEEE division of a driver-computed double literal by an exact
  * 64-bit register sum — bit-stable across engines (the repo's
  * margin_ratio pattern). No `ln`/`pow` of data-dependent doubles
  * lands in hashed output: libm rounding differs across engines, so
  * the linear-counting correction is applied driver/consumer-side via
  * [[corrected]] (exercised in `HllSpec`, not hashed).
  *
  * Scale shape: `registers` is one shuffle keyed on (group, bucket)
  * with map-side partial `max` — the classic mergeable-sketch
  * property (max is associative + commutative), so a 1000-executor
  * scan emits at most m=2^p partial rows per group per task and the
  * reduce side holds ≤ m rows per group. No distinct, no expand;
  * the full-fidelity alternative (`count(DISTINCT x)`) shuffles every
  * distinct value. [[estimate]] folds the ≤ m register rows per group
  * into one — driver-sized output regardless of corpus size.
  */
object Hll {

  /** Register-count exponent bounds: p in [4, 16] keeps the bucket
    * index inside the 60-bit hash and the register sum inside a
    * signed 64-bit long (max 2^p · 2^(61-p) = 2^61 < 2^63). */
  private def checkP(p: Int): Unit =
    require(p >= 4 && p <= 16, s"HLL precision p=$p outside [4,16]")

  /** α_m bias-correction constant (Flajolet 2007, fig. 3). */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m)
  }

  /** The driver-computed estimate numerator α_m · m² · 2^(61-p),
    * embedded as the SAME double literal in the Spark plan and the
    * oracle SQL (shortest-repr toString → nearest-double parse is
    * bit-exact both ways). */
  def numerator(p: Int): Double = {
    val m = 1 << p
    alpha(m) * m.toDouble * m.toDouble * math.pow(2, 61 - p)
  }

  /** Per-(group, bucket) max-rank registers: bucket = top p bits of
    * the 60-bit md5 hash, rho = leading-zero count of the remaining
    * (60-p)-bit suffix + 1 (in [1, 61-p]). Output: groupCols ++
    * (bucket, mj) with ≤ 2^p rows per group. */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int): DataFrame = {
    checkP(p)
    val wBits = 60 - p
    val wMod = 1L << wBits
    val h = HashParity.h60(col(valueCol).cast("string"))
    val w = pmod(h, lit(wMod))
    // leading zeros of the wBits-wide suffix = wBits - bitlen(w);
    // bin() drops leading zeros in both engines, bin(0) = "0"
    val rho = when(w === 0L, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(w)))
    df.select(groupCols.map(col) :+
        shiftright(h, wBits).as("bucket") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("mj"))
  }

  /** Fold registers to one row per group:
    *  - `n_zero_regs`: registers never hit (exact int),
    *  - `sum_pow`: Σ_j 2^(61-p-Mj) scaled so empty registers count
    *    2^(61-p) — the harmonic-mean denominator as an EXACT 64-bit
    *    integer (max 2^p · 2^(61-p) = 2^61), order-independent,
    *  - `est_hll`: numerator / sum_pow — the raw HLL estimate, one
    *    deterministic IEEE division,
    *  - `use_lc`: the Flajolet small-range condition (est ≤ 2.5m and
    *    empty registers exist) — where a consumer should prefer
    *    [[corrected]]. */
  def estimate(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    checkP(p)
    val m = 1L << p
    val maxRho = 61 - p
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("hit"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - mj)")).as("sp_hit"))
      .select(groupCols.map(col) :+
        (lit(m) - col("hit")).as("n_zero_regs") :+
        (col("sp_hit") + (lit(m) - col("hit")) * lit(1L << maxRho))
          .as("sum_pow"): _*)
      .withColumn("est_hll", lit(numerator(p)) / col("sum_pow").cast("double"))
      .withColumn("use_lc",
        col("est_hll") <= lit(2.5 * m) && col("n_zero_regs") > 0L)
  }

  /** Driver/consumer-side final estimate with the linear-counting
    * small-range correction (Flajolet 2007 §4): m·ln(m/V) when the
    * raw estimate is in the biased region and empty registers remain.
    * Uses libm `ln`, so it stays OUT of oracle-hashed output. */
  def corrected(estHll: Double, nZeroRegs: Long, p: Int): Double = {
    val m = (1L << p).toDouble
    if (estHll <= 2.5 * m && nZeroRegs > 0)
      m * math.log(m / nZeroRegs.toDouble)
    else estHll
  }

  /** The oracle-SQL twin of registers→estimate for DuckDB, shared so
    * the constants can never drift from the Scala plan. `valueSql`
    * must render the value as VARCHAR exactly as Spark's
    * cast-to-string does (integers do). */
  def estimateSql(table: String, groupCol: String, valueSql: String,
      p: Int): String = {
    checkP(p)
    val m = 1L << p
    val wMod = 1L << (60 - p)
    val maxRho = 61 - p
    s"""WITH vals AS (
       |  SELECT $groupCol,
       |    CAST('0x' || substr(md5($valueSql), 1, 15) AS BIGINT) AS h
       |  FROM $table),
       |regs AS (
       |  SELECT $groupCol, h // $wMod AS bucket,
       |    max(CASE WHEN h % $wMod = 0 THEN $maxRho
       |        ELSE $maxRho - length(bin(h % $wMod)) END) AS mj
       |  FROM vals GROUP BY 1, 2),
       |folded AS (
       |  SELECT $groupCol, $m - count(*) AS n_zero_regs,
       |    CAST(sum(CAST(1 AS BIGINT) << ($maxRho - mj)) AS BIGINT)
       |      + ($m - count(*)) * (CAST(1 AS BIGINT) << $maxRho) AS sum_pow
       |  FROM regs GROUP BY 1)
       |SELECT $groupCol, n_zero_regs, sum_pow,
       |  ${numerator(p)} / CAST(sum_pow AS DOUBLE) AS est_hll,
       |  ${numerator(p)} / CAST(sum_pow AS DOUBLE) <= ${2.5 * m}
       |    AND n_zero_regs > 0 AS use_lc
       |FROM folded""".stripMargin
  }
}
