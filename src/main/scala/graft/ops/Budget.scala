package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: given a per-document integer
  * quality score and a token budget, keep the best-scoring documents
  * until the budget is exhausted — the "select the top slice of the
  * corpus worth `B` tokens" step between quality scoring and mixture
  * construction.
  *
  * The naive formulation is a GLOBAL running token sum over
  * (score DESC, id) — a partitionless window that funnels the whole
  * corpus through one task. This operator instead resolves the
  * selection at SCORE granularity first, the same shape as
  * [[Curriculum.equalFreqBins]]:
  *
  *   1. one map-side-combined aggregate → per-score token totals
  *      (bounded by the score domain, ≤ 1e6+1 rows for ppm scores);
  *   2. a running sum over THAT bounded frame (tiny window) gives
  *      each score stratum its starting budget position;
  *   3. strata that end inside the budget keep unconditionally,
  *      strata that start past it drop unconditionally — decided by
  *      a broadcast join, no per-document window at all;
  *   4. only the ONE cutoff stratum (starts inside, ends outside)
  *      runs a running sum, partitioned BY ITS SCORE — a
  *      partition-local window over just the documents tied at the
  *      cutoff score, never the corpus.
  *
  * The decision is identical to the global-window formulation (the
  * admission rule is "a document is kept iff the budget is not yet
  * exhausted when its turn arrives in (score DESC, id) order"), so an
  * exact single-window oracle replays it; the plan just never builds
  * the global funnel. All arithmetic is integer.
  */
object Budget {

  /** Per-document keep decision under `budgetTokens`. `df` must carry
    * integer columns `scoreCol` (higher = better) and `tokensCol`
    * (> 0), and a unique `idCol` breaking score ties (ascending).
    * Returns (id, score, n_tokens, keep). */
  def select(
      df: DataFrame, idCol: String, scoreCol: String, tokensCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0: $budgetTokens")
    val docs = df.select(
      col(idCol).as("id"),
      col(scoreCol).cast("long").as("score"),
      col(tokensCol).cast("long").as("n_tokens"))
    // (2) stratum starting positions: bounded by the score domain
    val strata = docs.groupBy(col("score"))
      .agg(sum(col("n_tokens")).as("stratum_tokens"))
      .withColumn("start_excl",
        coalesce(sum(col("stratum_tokens")).over(
          Window.orderBy(col("score").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // (3) whole-stratum admission where no per-doc order is needed
    val tagged = docs.join(broadcast(strata), Seq("score"))
      .withColumn("whole", when(
        col("start_excl") + col("stratum_tokens") <= budgetTokens, lit(1L))
        .when(col("start_excl") >= budgetTokens, lit(0L)))
    // (4) the single cutoff stratum: partition-local running sum over
    // the documents tied at that score only
    val cutoff = tagged.filter(col("whole").isNull)
      .withColumn("intra_excl",
        coalesce(sum(col("n_tokens")).over(
          Window.partitionBy(col("score")).orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("keep",
        (col("start_excl") + col("intra_excl") < budgetTokens).cast("long"))
    val decided = tagged.filter(col("whole").isNotNull)
      .withColumn("keep", col("whole"))
    decided.select(col("id"), col("score"), col("n_tokens"), col("keep"))
      .unionByName(
        cutoff.select(col("id"), col("score"), col("n_tokens"), col("keep")))
  }
}
