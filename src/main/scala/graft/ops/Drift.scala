package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.CacheScope.Scoped
import graft.functions.HashParity

/** Mixture-drift audit: how far each source's token distribution
  * sits from the corpus-wide mixture — the data-card diagnostic a
  * curation pipeline reads before weighting sources ([[Mix]]) or
  * importance-sampling against a target ([[Importance]]).
  *
  * Distance is L1 over hashed-unigram integer ppm histograms
  * (`sum_b |ppm_src(b) - ppm_all(b)|` = 2e6 × total-variation
  * distance): 0 for a source that mirrors the mixture, up to
  * 2,000,000 for one with disjoint vocabulary. Same integer-exact
  * hashed-bucket construction as [[Importance]] (KL would need logs;
  * TV is the standard metric that stays in integer arithmetic).
  *
  * Scale shape: the corpus reduces once to slim (src, bucket) pairs
  * (cached — feeds the per-source AND the corpus-wide histogram);
  * both histograms are map-side-combined aggregates bounded by
  * |sources| × nBuckets and nBuckets rows. The per-source L1 fold
  * runs on the CROSS of sources × observed buckets (bounded, never
  * corpus-sized) so buckets a source misses still contribute
  * `ppm_all(b)`. No corpus-sized shuffle anywhere.
  */
object Drift {

  /** One row per source: (src, n_docs, n_toks, l1_ppm), ordered by
    * the caller. */
  def sourceDrift(
      corpus: DataFrame, textCol: String, srcCol: String,
      nBuckets: Int = 4096): DataFrame = {
    val rows = graft.core.Par.widen(corpus)
      .select(col(srcCol).as("src"),
        explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col("src"),
        pmod(HashParity.h28(col("t")), lit(nBuckets.toLong)).as("b"))
      .scopedCache()
    val tot = rows.agg(count(lit(1)).as("tot"))
    val allPpm = rows.groupBy(col("b")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("b"), expr("n * 1000000 DIV tot").as("appm"))
    val srcTot = rows.groupBy(col("src")).agg(count(lit(1)).as("stot"))
    val srcPpm = rows.groupBy(col("src"), col("b")).agg(count(lit(1)).as("n"))
      .join(broadcast(srcTot), Seq("src"))
      .select(col("src"), col("b"), expr("n * 1000000 DIV stot").as("sppm"))
    // sources x observed buckets, so missing buckets still count
    val grid = srcTot.select(col("src")).crossJoin(allPpm)
      .join(srcPpm, Seq("src", "b"), "left")
      .na.fill(0L, Seq("sppm"))
    val l1 = grid.groupBy(col("src"))
      .agg(sum(abs(col("sppm") - col("appm"))).as("l1_ppm"))
    val docs = corpus.groupBy(col(srcCol).as("src"))
      .agg(count(lit(1)).as("n_docs"))
    docs.join(srcTot, Seq("src")).join(l1, Seq("src"))
      .select(col("src"), col("n_docs"), col("stot").as("n_toks"),
        col("l1_ppm"))
  }
}
