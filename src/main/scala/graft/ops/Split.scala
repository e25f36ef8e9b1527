package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashParity

/** Deterministic dataset splitting for training pipelines: every row
  * lands in exactly one named split, decided by a salted md5 of its
  * id — stable across runs, engines, partitionings, and data order
  * (unlike `randomSplit`, which depends on partition layout), and
  * replayable in the DuckDB oracle. Changing the salt re-deals the
  * split; rows added later don't move existing rows between splits.
  */
object Split {

  /** Percent bucket in [0,100) from a salted 28-bit md5 of the id. */
  def bucket(id: Column, salt: String): Column =
    HashParity.h28(concat(id.cast("string"), lit("#" + salt))) % 100

  /** Split label from cumulative percentage cuts, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)`. */
  def splitLabel(id: Column, salt: String, cuts: Seq[(String, Int)]): Column = {
    require(cuts.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = bucket(id, salt)
    val thresholds = cuts.scanLeft(0)(_ + _._2).tail
    cuts.map(_._1).zip(thresholds).init
      .foldRight(lit(cuts.last._1): Column) { case ((name, cut), rest) =>
        when(b < cut, name).otherwise(rest)
      }
  }

  /** DuckDB spelling of [[bucket]] — keep in lock-step. */
  def bucketSql(idExpr: String, salt: String): String =
    s"CAST('0x' || substr(md5(CAST($idExpr AS VARCHAR) || '#$salt'), 1, 7) AS BIGINT) % 100"

  /** Per-group cap rank (Dolma-style per-domain caps): rows within a
    * group ordered by a salted 60-bit md5 of the id (id as the total-
    * order tiebreak); `capRank(...) <= cap` keeps a deterministic,
    * salt-re-dealable sample of at most `cap` rows per group.
    *
    * Unlike [[stratifiedFilter]] (a RATE per group) this bounds the
    * absolute COUNT — the web-pipeline shape for capping an
    * over-represented domain. Scale: a `rank <= cap` filter directly
    * above the window becomes a WindowGroupLimit, so each map task
    * ships at most cap rows per group into the exchange — the hot
    * domain never funnels through one sort. */
  def capRank(id: Column, group: Column, salt: String): Column =
    row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(group)
        .orderBy(HashParity.h60(concat(id.cast("string"), lit("#" + salt))), id))

  /** DuckDB spelling of [[capRank]] — keep in lock-step. */
  def capRankSql(idExpr: String, groupExpr: String, salt: String): String =
    s"row_number() OVER (PARTITION BY $groupExpr ORDER BY " +
      s"CAST('0x' || substr(md5(CAST($idExpr AS VARCHAR) || '#$salt'), 1, 15) AS BIGINT), $idExpr)"

  /** Stratified-sampling predicate: keep a row iff its salted bucket
    * falls under its group's percentage (`rates`, with `defaultPct`
    * for unlisted groups). Same determinism contract as
    * [[splitLabel]]; rates are exact in expectation per group, and a
    * group's sample is a SUBSET of any higher-rate sample under the
    * same salt (nested samples — useful for scaling experiments). */
  def stratifiedFilter(
      id: Column, group: Column, salt: String,
      rates: Seq[(String, Int)], defaultPct: Int): Column = {
    val pct = rates.foldRight(lit(defaultPct): Column) { case ((g, p), rest) =>
      when(group === g, p).otherwise(rest)
    }
    bucket(id, salt) < pct
  }
}
