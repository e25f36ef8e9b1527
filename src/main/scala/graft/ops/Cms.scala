package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-replayable Count-Min frequency sketch (Cormode &
  * Muthukrishnan 2005): d hash rows × w counters, every counter an
  * EXACT integer sum, so — unlike any floating-point sketch — the
  * whole structure and every estimate replays bit-identically in the
  * DuckDB oracle from the same md5 parity hashes.
  *
  * The frequency twin of [[Hll]]: HLL answers "how many distinct",
  * CMS answers "how often is THIS key" with d·w longs of state
  * regardless of corpus size. Registers build in one shuffle keyed on
  * (group, row, col) with map-side partial sums (counts are
  * associative — the mergeable-sketch property), so a 1000-executor
  * scan emits at most d·w partial rows per group per task; estimates
  * are a broadcast-sized join of the candidate keys against ≤ d·w
  * register rows per group. The estimate `min_i CMS[i][h_i(x)]` never
  * underestimates (all collisions add), and overshoots by at most
  * εN = (e/w)·N with probability 1−(1/2)^d — the bound the spec
  * exercises.
  */
object Cms {

  /** Row-i column index of a value: md5-parity 28-bit hash of
    * `"i:" + value`, reduced mod w. Matches the oracle's
    * `CAST('0x' || substr(md5(i || ':' || x), 1, 7) AS BIGINT) % w`. */
  def colOf(i: Int, value: Column, w: Int): Column =
    pmod(graft.functions.HashParity.h28(
      concat(lit(s"$i:"), value.cast("string"))), lit(w.toLong))

  /** Per-(group, row, col) counter sums: ≤ d·w rows per group, one
    * shuffle, map-side combine. */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 2, s"bad CMS shape d=$d w=$w")
    val rows = (0 until d).map { i =>
      struct(lit(i).as("row"), colOf(i, col(valueCol), w).as("col"))
    }
    df.select(groupCols.map(col) :+ explode(array(rows: _*)).as("rc"): _*)
      .select(groupCols.map(col) :+ col("rc.row").as("row") :+
        col("rc.col").as("col"): _*)
      .groupBy((groupCols :+ "row" :+ "col").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Point estimates for candidate keys: `min_i CMS[i][h_i(key)]`.
    * `candidates` carries groupCols + `keyCol` (+ optional
    * `carryCols`, functionally dependent on the key — e.g. a witness
    * exact count — passed through the fold so the candidate frame is
    * consumed exactly ONCE; re-joining it after the estimate would
    * recompute its whole lineage, a third corpus scan at 100 TB).
    * Registers join on (group, row, col) — both sides bounded, the
    * join broadcast-sized at any corpus scale. Keys the sketch never
    * saw estimate 0 (their counters may still be 0). */
  def estimate(registers: DataFrame, candidates: DataFrame,
      groupCols: Seq[String], keyCol: String, d: Int, w: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    val keep = groupCols ++ (keyCol +: carryCols)
    val hashed = (0 until d).foldLeft(candidates) { (acc, i) =>
      acc.withColumn(s"__c$i", colOf(i, col(keyCol), w))
    }
    val long = hashed.select(keep.map(col) :+
      explode(array((0 until d).map(i =>
        struct(lit(i).as("row"), col(s"__c$i").as("col"))): _*)).as("rc"): _*)
      .select(keep.map(col) :+
        col("rc.row").as("row") :+ col("rc.col").as("col"): _*)
    long.join(registers, groupCols :+ "row" :+ "col", "left")
      .na.fill(0L, Seq("n"))
      .groupBy(keep.map(col): _*)
      .agg(min(col("n")).as("n_est"))
  }

  /** The oracle-SQL twin for DuckDB, constants shared with the plan:
    * registers + min-estimate for the candidate set produced by
    * `candidatesSql` (must yield columns `$groupCol, $keyAlias`).
    * `valueSql` renders the sketched value as VARCHAR exactly as
    * Spark's cast does. */
  def estimateSql(table: String, groupCol: String, valueSql: String,
      candidatesSql: String, keyAlias: String, d: Int, w: Int): String =
    s"""regs AS (
       |  SELECT $groupCol, i AS row,
       |    CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
       |      $valueSql), 1, 7) AS BIGINT) % $w AS col,
       |    count(*) AS n
       |  FROM $table, UNNEST(range(0, $d)) AS t(i)
       |  GROUP BY 1, 2, 3),
       |cand AS ($candidatesSql),
       |probe AS (
       |  SELECT c.$groupCol, c.$keyAlias, t.i AS row,
       |    CAST('0x' || substr(md5(CAST(t.i AS VARCHAR) || ':' ||
       |      CAST(c.$keyAlias AS VARCHAR)), 1, 7) AS BIGINT) % $w AS col
       |  FROM cand c, UNNEST(range(0, $d)) AS t(i)),
       |est AS (
       |  SELECT p.$groupCol, p.$keyAlias,
       |    min(COALESCE(r.n, 0)) AS n_est
       |  FROM probe p LEFT JOIN regs r
       |    ON p.$groupCol = r.$groupCol AND p.row = r.row AND p.col = r.col
       |  GROUP BY 1, 2)""".stripMargin
}
