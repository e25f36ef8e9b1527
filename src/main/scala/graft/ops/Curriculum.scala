package graft.ops

import graft.core.CacheScope.Scoped
import org.apache.spark.sql.DataFrame
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
  * histogram (≤ maxScore/bucketWidth rows, guarded loudly) takes one
  * map-side-combined aggregate and is collected DRIVER-SIDE, the
  * running sum assigns each BUCKET a bin by integer
  * cross-multiplication on the driver, and docs join the broadcast
  * bucket→bin local table. Equal frequency holds up to bucket
  * granularity; ties at a boundary land in ONE bin (value-stable:
  * equal scores never split across bins, which ntile cannot
  * promise).
  *
  * The driver-side collect is deliberate: when the histogram stayed
  * a lazy frame, its three consumers (running sum, total, final
  * join) each re-ran the ENTIRE upstream lineage — chained calls
  * (e.g. RFM's r→f→m) multiplied that into ~3³ full re-scans of the
  * fact table. With the bounded histogram materialized once, each
  * call costs exactly one aggregate pass over its input plus one
  * broadcast hash join of a LocalTableScan, and the returned plan
  * contains the upstream exactly once.
  */
object Curriculum {

  /** Hard ceiling on collected histogram rows (≈32 MB of (hb, hn)
    * pairs). Raise `bucketWidth` if the score range exceeds it. */
  val MaxHistogramBuckets: Int = 2000000

  /** Adds `bin` (1..nBins, ascending score order) to `df` by
    * ~equal-frequency value-threshold binning of integer column
    * `valueCol` (scores must be non-negative). Eager: runs one
    * aggregate job over `df` at call time to build the histogram. */
  def equalFreqBins(
      df: DataFrame, valueCol: String,
      nBins: Int, bucketWidth: Long): DataFrame = {
    require(nBins > 0 && bucketWidth > 0,
      s"nBins and bucketWidth must be positive (got $nBins, $bucketWidth)")
    // scoped cache: the histogram collect below and the caller's
    // eventual action otherwise each recompute the full upstream —
    // ruinous when the input is itself an expensive report (the
    // perplexity pipeline) or a chain of prior equalFreqBins calls
    val b = df.withColumn("hb",
      expr(s"CAST($valueCol AS BIGINT) DIV $bucketWidth")).scopedCache()
    // one map-side-combined pass; bounded by maxScore/bucketWidth rows
    val hist = b.groupBy(col("hb")).agg(count(lit(1)).as("hn"))
      .limit(MaxHistogramBuckets + 1).collect()
    require(hist.length <= MaxHistogramBuckets,
      s"equalFreqBins: histogram exceeded $MaxHistogramBuckets buckets for " +
        s"column '$valueCol' at bucketWidth=$bucketWidth — raise bucketWidth " +
        "so the score range collapses into a driver-collectable histogram")
    val sorted = hist.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val tot = sorted.iterator.map(_._2).sum
    var cumExcl = 0L
    val binRows = sorted.map { case (hb, hn) =>
      val bin = math.min(nBins.toLong * cumExcl / tot + 1L, nBins.toLong)
      cumExcl += hn
      (hb, bin)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val binOf = binRows.toSeq.toDF("hb", "bin")
    b.join(broadcast(binOf), Seq("hb")).drop("hb")
  }

  /** Multi-column single-pass variant of [[equalFreqBins]]: one
    * aggregate pass over `df` builds EVERY requested column's
    * histogram at once (the per-column bin assignment is unchanged —
    * each histogram folds independently on the driver), and the
    * result attaches all bin columns through broadcast hash joins of
    * the per-column bucket→bin local tables. A chain of k
    * [[equalFreqBins]] calls (the RFM r→f→m shape) pays k cache
    * materializations and k histogram passes, each over the previous
    * call's join output; this pays ONE cache of the input and ONE
    * histogram pass for all k columns. `specs` is
    * (valueCol, binCol, bucketWidth) per requested bin column. */
  def equalFreqBinsMulti(df: DataFrame,
      specs: Seq[(String, String, Long)], nBins: Int): DataFrame = {
    require(nBins > 0 && specs.nonEmpty, "nBins and specs must be non-empty")
    specs.foreach { case (vc, _, w) =>
      require(w > 0, s"bucketWidth must be positive for '$vc' (got $w)") }
    val hbCol = specs.map { case (vc, bc, w) =>
      s"__hb_$bc" -> expr(s"CAST($vc AS BIGINT) DIV $w") }
    val b = hbCol.foldLeft(df) { case (acc, (n, e)) =>
      acc.withColumn(n, e) }.scopedCache()
    // one map-side-combined pass for all histograms: (column index,
    // bucket) pairs combine to ≤ k × buckets rows before the exchange
    val pairs = b.select(explode(array(specs.zipWithIndex.map {
      case ((_, bc, _), i) =>
        struct(lit(i).as("ci"), col(s"__hb_$bc").as("hb")) }: _*)).as("p"))
      .select(col("p.ci"), col("p.hb"))
    val hist = pairs.groupBy(col("ci"), col("hb"))
      .agg(count(lit(1)).as("hn"))
      .limit(specs.size * MaxHistogramBuckets + 1).collect()
    val byCol = hist.groupBy(_.getInt(0))
    val spark = df.sparkSession
    import spark.implicits._
    specs.zipWithIndex.foldLeft(b: DataFrame) {
      case (acc, ((vc, bc, w), i)) =>
        val rows = byCol.getOrElse(i, Array.empty)
        require(rows.length <= MaxHistogramBuckets,
          s"equalFreqBinsMulti: histogram exceeded $MaxHistogramBuckets " +
            s"buckets for column '$vc' at bucketWidth=$w — raise " +
            "bucketWidth so the score range collapses into a " +
            "driver-collectable histogram")
        val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        val tot = sorted.iterator.map(_._2).sum
        var cumExcl = 0L
        val binRows = sorted.map { case (hb, hn) =>
          val bin = math.min(nBins.toLong * cumExcl / tot + 1L, nBins.toLong)
          cumExcl += hn
          (hb, bin)
        }
        val binOf = binRows.toSeq.toDF(s"__hb_$bc", bc)
        acc.join(broadcast(binOf), Seq(s"__hb_$bc")).drop(s"__hb_$bc")
    }
  }
}
