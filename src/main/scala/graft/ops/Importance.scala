package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.CacheScope.Scoped
import graft.functions.HashParity

/** DSIR-style data selection: score corpus documents by how much
  * their hashed-token distribution resembles a TARGET distribution
  * (a benchmark suite, a curated high-quality slice) relative to the
  * raw corpus — the importance-resampling construction of Xie et al.
  * 2023 ("Data Selection for Language Models via Importance
  * Resampling"), in an integer-arithmetic variant.
  *
  * DSIR proper scores docs by sum of log(p_target / p_raw) over
  * hashed n-gram features. Log-ratios of float probabilities don't
  * replay bit-for-bit across engines, so this variant scores by the
  * integer ppm DIFFERENCE `sum(ppm_target(b) - ppm_raw(b))` over the
  * doc's token buckets — the same "does the target over- or
  * under-represent this feature" signal, monotone in the same
  * direction, and exactly reproducible anywhere 64-bit integers
  * divide the same way. The keep decision is length-normalized by
  * CROSS-MULTIPLICATION (`score * 1000 >= keepAtPml * n_toks`), not
  * division, so negative scores never hit engine-specific integer
  * division semantics.
  *
  * Scale shape: the corpus is reduced to slim (id, bucket) long
  * pairs once (cached — consumed by the raw histogram AND the
  * scoring join); both histograms are map-side-combined aggregates
  * of at most `nBuckets` rows; the weight table (<= nBuckets rows)
  * is BROADCAST, so scoring is one map-side join + one per-doc
  * aggregate — no corpus-sized shuffle anywhere. The target side is
  * tiny by construction (benchmarks / curated seeds).
  *
  * Overflow: |weight| <= 1e6 ppm, so |score| <= n_toks * 1e6; with
  * the [[Dedup.PosCap]]-style 1e6-token doc bound, |score| <= 1e12
  * and the cross-multiplied comparison stays far inside a long.
  */
object Importance {

  /** Slim hashed-unigram bucket rows: (id, b). */
  def bucketRows(
      df: DataFrame, textCol: String, idCol: String, nBuckets: Int): DataFrame =
    graft.core.Par.widen(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col("id"), pmod(HashParity.h28(col("t")), lit(nBuckets.toLong)).as("b"))

  /** Per-bucket integer ppm of a bucket-row frame: (b, ppm). ONE
    * pass over `rows`: the total is the sum of the histogram's own
    * counts (an unpartitioned window over <= nBuckets rows), not a
    * second aggregate of the input — a separate total would re-run
    * the frame's whole lineage when it isn't cached (the
    * q_importance target side read the corpus twice for exactly this
    * reason). */
  def bucketPpm(rows: DataFrame): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    rows.groupBy(col("b")).agg(count(lit(1)).as("n"))
      .withColumn("tot", sum(col("n")).over(all))
      .select(col("b"), expr("n * 1000000 DIV tot").as("ppm"))
  }

  /** One row per corpus doc: (id, n_toks, score, keep) with
    * `score = sum over tokens of (ppm_target(bucket) -
    * ppm_raw(bucket))` and `keep = score * 1000 >= keepAtPml *
    * n_toks` — i.e. the doc's mean per-token weight clears
    * `keepAtPml` per-mille-ppm. */
  def importanceReport(
      corpus: DataFrame, target: DataFrame,
      textCol: String, idCol: String,
      nBuckets: Int = 4096, keepAtPml: Long = 0L): DataFrame = {
    val cr = bucketRows(corpus, textCol, idCol, nBuckets).scopedCache()
    val tr = bucketRows(target, textCol, idCol, nBuckets)
    val wt = bucketPpm(cr).withColumnRenamed("ppm", "rppm")
      .join(bucketPpm(tr).withColumnRenamed("ppm", "tppm"), Seq("b"), "full")
      .select(col("b"),
        (coalesce(col("tppm"), lit(0L)) - coalesce(col("rppm"), lit(0L))).as("wt"))
    val scored = cr.join(broadcast(wt), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("wt")).as("score"))
    corpus.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .na.fill(0L, Seq("n_toks", "score"))
      .withColumn("keep",
        (col("score") * lit(1000L) >= lit(keepAtPml) * col("n_toks")).cast("long"))
  }
}
