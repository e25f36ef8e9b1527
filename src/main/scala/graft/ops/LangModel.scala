package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.CacheScope.Scoped

/** N-gram language-model quality filtering — the CCNet/KenLM-style
  * "perplexity gate" (Wenzek et al. 2020) every web-scale curation
  * pipeline runs between raw text and the mixer: train a small LM on
  * a trusted reference slice (Wikipedia in CCNet; any curated frame
  * here), score every corpus document by how surprising its token
  * sequence is under that model, and drop the high-perplexity tail.
  *
  * KenLM scores by sum of log probabilities; float logs don't replay
  * bit-for-bit across engines, so — like [[Importance]]'s ppm
  * variant of DSIR — this scores by the integer INVERSE-PROBABILITY
  * ppm of each bigram under add-one smoothing:
  *
  *   cost(w | p) = min(1e6 * (c(p) + V) DIV (c(p,w) + 1), capCost)
  *
  * the reciprocal of `P(w|p) = (c(p,w)+1) / (c(p)+V)` in parts per
  * million. A doc's mean cost is the ARITHMETIC mean of inverse
  * probabilities where true perplexity is their geometric mean; by
  * AM >= GM the statistic upper-bounds perplexity and moves in the
  * same direction — fluent text scores low, gibberish and
  * out-of-domain text score high — while every step is 64-bit
  * integer arithmetic that replays exactly in any engine. The keep
  * decision cross-multiplies (`total <= keepAtMeanCost * n`) so no
  * division touches the verdict.
  *
  * `capCost` (default 1e9 ppm = inverse probability 1000) bounds the
  * unseen-bigram penalty the way KenLM's backoff floor does, and
  * makes the per-doc sum overflow-safe: with the [[Dedup.PosCap]]
  * 1e6-token doc bound, total <= 1e15 — far inside a long.
  *
  * Scale shape: the corpus reduces once to slim (id, prev, cur)
  * bigram rows; the model is two map-side-combined count aggregates
  * of the REFERENCE slice (curated, orders of magnitude smaller than
  * the corpus) plus a 1-row vocabulary count that rides along as a
  * broadcast. Scoring is two equi-joins against those count tables —
  * never a broadcast assumption on the model side, so a large
  * reference still works. The `prev`-only context join is skewed by
  * construction (stopwords dominate); the build side has one row per
  * key, so AQE's skew-split handles the probe-side hot keys
  * (`SkewJoinSpec` covers the mechanism).
  */
object LangModel {

  /** (id, w) token-array rows — the one-per-doc projection both the
    * bigram pairs and the vocabulary count derive from. */
  def tokenArrays(df: DataFrame, textCol: String, idCol: String): DataFrame =
    graft.core.Par.widen(df)
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("w"))

  /** (id, prev, cur) pairs from a [[tokenArrays]] frame. Docs with
    * fewer than two tokens contribute nothing (and score keep=1
    * downstream — one token carries no sequence evidence). */
  def pairsFromArrays(rw: DataFrame): DataFrame =
    rw.filter(size(col("w")) >= 2)
      .select(col("id"), explode(
        arrays_zip(expr("slice(w, 1, size(w) - 1)"),
          expr("slice(w, 2, size(w) - 1)"))).as("p"))
      .select(col("id"), col("p.0").as("prev"), col("p.1").as("cur"))

  /** Slim (id, prev, cur) rows: consecutive whitespace-token pairs. */
  def bigramRows(df: DataFrame, textCol: String, idCol: String): DataFrame =
    pairsFromArrays(tokenArrays(df, textCol, idCol))

  /** Slim (id, n_bigrams, total_cost) for corpus docs with at least
    * one bigram — the model build + scoring shared by
    * [[perplexityReport]] and [[keepByPerplexity]]. Zero-bigram docs
    * are ABSENT here (they carry no sequence evidence and keep
    * trivially); the callers resurrect them via a left join. */
  def bigramCosts(
      corpus: DataFrame, ref: DataFrame,
      textCol: String, idCol: String,
      capCost: Long): DataFrame = {
    // ONE ref scan: the cached token-array frame feeds the two model
    // count tables AND the vocabulary size (vsz needs the tokens of
    // single-token docs too, which the bigram pairs drop — so the
    // cache sits at the array stage, not the pair stage)
    val rw = tokenArrays(ref, textCol, idCol).scopedCache()
    val rb = pairsFromArrays(rw)
    val ctx = rb.groupBy(col("prev")).agg(count(lit(1)).as("c_ctx"))
    val big = rb.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c_big"))
    val vsz = rw.select(explode(col("w")).as("tk"))
      .agg(count_distinct(col("tk")).as("vsz"))
    bigramRows(corpus, textCol, idCol)
      .join(big, Seq("prev", "cur"), "left")
      .join(ctx, Seq("prev"), "left")
      .crossJoin(broadcast(vsz))
      .select(col("id"), least(
        expr("1000000 * (coalesce(c_ctx, 0) + vsz) DIV (coalesce(c_big, 0) + 1)"),
        lit(capCost)).as("cost"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cost")).as("total_cost"))
  }

  /** One row per corpus doc: (id, n_bigrams, total_cost, mean_cost,
    * keep) with keep = `total_cost <= keepAtMeanCost * n_bigrams`
    * (cross-multiplied; zero-bigram docs keep trivially). */
  def perplexityReport(
      corpus: DataFrame, ref: DataFrame,
      textCol: String, idCol: String,
      keepAtMeanCost: Long,
      capCost: Long = 1000000000L): DataFrame = {
    // per-bigram cost <= capCost, so any threshold above the cap keeps
    // everything — clamping preserves semantics and keeps the ANSI
    // cross-multiplication inside a long (capCost * 1e6-token docs)
    val keepAt = math.min(keepAtMeanCost, capCost)
    corpus.select(col(idCol).as("id"))
      .join(bigramCosts(corpus, ref, textCol, idCol, capCost), Seq("id"), "left")
      .na.fill(0L, Seq("n_bigrams", "total_cost"))
      .withColumn("mean_cost", when(col("n_bigrams") === 0L, 0L)
        .otherwise(expr("total_cost DIV n_bigrams")))
      .withColumn("keep",
        (col("total_cost") <= lit(keepAt) * col("n_bigrams")).cast("long"))
  }

  /** Gate `corpus` IN PLACE: the rows (all columns) whose mean
    * bigram cost is within `keepAtMeanCost`, zero-bigram docs kept
    * trivially. Use this when the pipeline goes on to PROCESS the
    * surviving text: filtering the report and joining the ids back
    * to the corpus re-derives the corpus lineage a second time (one
    * extra scan of the fact table at any scale), while gating in
    * place left-joins the slim (id, cost) frame onto the pass the
    * caller already owns — the carried-columns rule (PLANS.md r11)
    * applied to the perplexity gate. */
  def keepByPerplexity(
      corpus: DataFrame, ref: DataFrame,
      textCol: String, idCol: String,
      keepAtMeanCost: Long,
      capCost: Long = 1000000000L): DataFrame = {
    val keepAt = math.min(keepAtMeanCost, capCost)
    corpus
      .join(bigramCosts(corpus, ref, textCol, idCol, capCost)
          .withColumnRenamed("id", idCol),
        Seq(idCol), "left")
      .filter(col("total_cost").isNull ||
        col("total_cost") <= lit(keepAt) * col("n_bigrams"))
      .drop("n_bigrams", "total_cost")
  }
}
