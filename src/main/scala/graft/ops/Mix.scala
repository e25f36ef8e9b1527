package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashParity

/** Source mixing: sample each source at the rate that hits a target
  * token mixture — the curation step between "deduped, quality-gated
  * corpus" and "packed training batches". Given per-source shares
  * (`weights`) and a total token `budget`, each source's target is
  * `share * budget` tokens; its sampling rate is
  * `target / available` (capped at 1 — a source can't be upsampled
  * by filtering), and a row is kept iff its salted md5 bucket falls
  * under the rate. The same determinism contract as [[Split]]:
  * stable across runs, engines, partitionings and data order, and a
  * lower-budget mix is a SUBSET of a higher-budget one under the
  * same salt (nested mixtures — shrink the budget, keep the cache).
  * Sources without a weight are dropped (a mixture is a whitelist).
  *
  * Scale shape: one narrow scan derives (id, source, tokens); the
  * per-source availability aggregate is |sources| rows, joined back
  * as a broadcast; the keep decision is a pure per-row expression.
  * No shuffle touches full rows — the wide columns rejoin by id
  * downstream if needed. Rates are exact in expectation per source;
  * the kept-set audit (docs/tokens actually kept per source) rides
  * on the output so the manifest carries its own totals.
  */
object Mix {

  /** Parts-per-million bucket from a salted md5 of the id — the
    * [[Split.bucket]] scheme at mixture resolution. */
  def bucketPpm(id: Column, salt: String): Column =
    HashParity.h28(concat(id.cast("string"), lit("#" + salt))) % 1000000L

  /** DuckDB spelling of [[bucketPpm]] — keep in lock-step. */
  def bucketPpmSql(idExpr: String, salt: String): String =
    s"CAST('0x' || substr(md5(CAST($idExpr AS VARCHAR) || '#$salt'), 1, 7) AS BIGINT) % 1000000"

  /** Kept rows + per-source audit:
    * (id, source, n_tokens, avail_docs, avail_tokens, target_tokens,
    * rate_ppm, src_kept_docs, src_kept_tokens). */
  def mix(
      df: DataFrame, textCol: String, idCol: String, sourceCol: String,
      weights: Seq[(String, Double)], budgetTokens: Long, salt: String,
      tokensOf: Column => Column = Pack.whitespaceTokens): DataFrame = {
    require(weights.nonEmpty, "empty mixture")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate source in mixture weights")
    require(weights.forall(_._2 >= 0), "negative mixture weight")

    // share as a when-chain over the (small, literal) weight table;
    // unlisted sources get 0 and drop out of the mixture
    val share = weights.foldRight(lit(0.0): Column) { case ((s, p), rest) =>
      when(col("source") === s, p).otherwise(rest)
    }

    // narrow base feeds the availability aggregate AND the keep filter
    val base = df.select(
        col(idCol).as("id"),
        col(sourceCol).as("source"),
        tokensOf(col(textCol)).as("n_tokens"),
        bucketPpm(col(idCol), salt).as("ppm"))
      .cache()
    val rates = base.groupBy(col("source"))
      .agg(
        count(lit(1)).as("avail_docs"),
        sum(col("n_tokens")).as("avail_tokens"))
      .withColumn("target_tokens",
        floor(share * lit(budgetTokens.toDouble)).cast("long"))
      .withColumn("rate_ppm", least(lit(1000000L),
        floor(lit(1000000.0) * col("target_tokens") / col("avail_tokens"))
          .cast("long")))
    val kept = base.join(broadcast(rates), Seq("source"))
      .filter(col("ppm") < col("rate_ppm"))
      .drop("ppm")
      .cache()
    val audit = kept.groupBy(col("source"))
      .agg(
        count(lit(1)).as("src_kept_docs"),
        sum(col("n_tokens")).as("src_kept_tokens"))
    kept.join(broadcast(audit), Seq("source"))
      .select(col("id"), col("source"), col("n_tokens"),
        col("avail_docs"), col("avail_tokens"), col("target_tokens"),
        col("rate_ppm"), col("src_kept_docs"), col("src_kept_tokens"))
  }
}
