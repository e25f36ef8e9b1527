package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum / quality binning: order a corpus by a difficulty or
  * quality score and cut it into ~equal-frequency ordered bins (the
  * "train on easy first" schedule, or quality tiers for mixture
  * weighting).
  *
  * Exact ntile needs a TOTAL order — a partitionless window that
  * funnels the whole corpus through one task. This operator instead
  * bins by VALUE thresholds derived from a bounded integer
  * histogram: scores bucket at `bucketWidth` granularity, the
  * histogram (≤ maxScore/bucketWidth rows) takes one
  * map-side-combined aggregate, its running sum assigns each BUCKET
  * a bin by integer cross-multiplication, and docs join the
  * broadcast bucket→bin table. Equal frequency holds up to bucket
  * granularity; ties at a boundary land in ONE bin (value-stable:
  * equal scores never split across bins, which ntile cannot
  * promise). The only windows run over the tiny histogram.
  */
object Curriculum {

  /** Adds `bin` (1..nBins, ascending score order) to `df` by
    * ~equal-frequency value-threshold binning of integer column
    * `valueCol` (scores must be non-negative). */
  def equalFreqBins(
      df: DataFrame, valueCol: String,
      nBins: Int, bucketWidth: Long): DataFrame = {
    require(nBins > 0 && bucketWidth > 0,
      s"nBins and bucketWidth must be positive (got $nBins, $bucketWidth)")
    val b = df.withColumn("hb", expr(s"$valueCol DIV $bucketWidth"))
    val hist = b.groupBy(col("hb")).agg(count(lit(1)).as("hn"))
    // bounded windows: the histogram has at most maxScore/bucketWidth rows
    val cum = hist.withColumn("cum_excl",
      coalesce(sum(col("hn")).over(
        Window.orderBy(col("hb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = hist.agg(sum(col("hn")).as("tot"))
    val binOf = cum.crossJoin(broadcast(tot))
      .select(col("hb"),
        least(expr(s"CAST($nBins * cum_excl DIV tot AS BIGINT) + 1"),
          lit(nBins.toLong)).as("bin"))
    b.join(broadcast(binOf), Seq("hb")).drop("hb")
  }
}
