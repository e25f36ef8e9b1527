package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J1: the interval-overlap theta self-join (`runtimeOverlap`).
  *
  * Reference semantics (report_generator.py:92-112, doc
  * test/README.md:20): for each run i,
  * `Σ_{j≠i} clamp(overlap(i,j)) / length(i)`, optionally restricted
  * to runs sharing an equi-attribute (`overlapFilter`). The reference
  * is an O(n²) in-memory nested loop.
  *
  * Two physical plans behind one API:
  *  - [[naive]]: the direct theta join. Catalyst executes it as a
  *    BroadcastNestedLoopJoin — fine at report scale (≤ thousands of
  *    rows), quadratic beyond.
  *  - [[binned]]: the 100 TB plan. Each interval is exploded onto
  *    fixed time bins; candidates join on (equiKey, bin) — a plain
  *    shuffle-hash equi-join — and each overlapping pair is counted
  *    exactly once in the bin that contains the later of the two
  *    starts. Shuffle volume is O(n · avgBinsPerInterval); per-key
  *    fan-out is bounded by bin width, so skew is tunable.
  *
  * All arithmetic is integer microseconds with one final IEEE
  * division — deterministic and oracle-reproducible.
  */
object Overlap {

  /** Build [id, equiKey, s, e) interval frame from events:
    * s = ts in micros, e = s + value seconds. `equiKey` is the
    * optional `overlapFilter` attribute (None = all pairs compete,
    * reference default). */
  def intervals(events: DataFrame, equiKey: Option[String] = Some("event_type")): DataFrame =
    events.select(
      col("event_id").as("id"),
      equiKey.map(col).getOrElse(lit("all")).as("k"),
      col("ts_us").as("s"),
      (col("ts_us") + round(col("value") * 1e6, 0).cast("long")).as("e"))

  private def ratio(iv: DataFrame, perPair: DataFrame): DataFrame = {
    val summed = perPair.groupBy(col("id")).agg(sum(col("ov")).as("ov_us"))
    iv.join(summed, Seq("id"), "left")
      .select(
        col("id").as("event_id"),
        coalesce(col("ov_us"), lit(0L)).as("ov_us"),
        // zero-length runs exist in real data (value rounds to 0 µs);
        // they can strictly contain nothing, so their share is 0 —
        // the guard keeps ANSI division from failing the whole report
        when(col("e") === col("s"), lit(0.0d))
          .otherwise(coalesce(col("ov_us"), lit(0L)) / (col("e") - col("s")))
          .as("overlap_ratio"))
      .orderBy(col("event_id"))
  }

  /** Direct theta self-join (reference-shaped; BNL at small n). */
  def naive(events: DataFrame, equiKey: Option[String] = Some("event_type")): DataFrame = {
    val iv = intervals(events, equiKey)
    val a = iv.alias("a")
    val b = iv.alias("b")
    val pairs = a.join(b,
        col("a.k") === col("b.k") &&
        col("a.id") =!= col("b.id") &&
        col("a.s") < col("b.e") && col("b.s") < col("a.e"))
      .select(col("a.id").as("id"),
        (least(col("a.e"), col("b.e")) - greatest(col("a.s"), col("b.s"))).as("ov"))
    ratio(iv, pairs)
  }

  /** Bounds for [[autoBinUs]]: 1 second to 1 day, in microseconds. */
  val MinBinUs: Long = 1000000L
  val MaxBinUs: Long = 86400000000L
  private val FallbackBinUs: Long = 600000000L

  /** Derive the bin width from the interval-length distribution
    * itself — the one 100 TB knob of the binned plan, tuned from
    * data instead of hand-set. Width = the p90 span rounded UP to
    * the next power of two of microseconds: at that width ≥90% of
    * intervals explode onto at most 2 bins (shuffle volume stays
    * ~O(n)) while per-(key, bin) fan-out — the quadratic term —
    * shrinks with the data's own time density; the power-of-two
    * rounding absorbs approxQuantile jitter so the derived width is
    * stable run to run. One sampled driver-side quantile pass
    * (Greenwald-Khanna, bounded sketch — no full collect), loudly
    * clamped to [[MinBinUs]]/[[MaxBinUs]]: a degenerate distribution
    * (all-zero spans, one giant interval) must mis-tune a knob, not
    * take down the plan. */
  def autoBinUs(iv: DataFrame, relErr: Double = 0.01): Long = {
    val q = iv.select((col("e") - col("s")).cast("double").as("span"))
      .stat.approxQuantile("span", Array(0.9), relErr)
    if (q.isEmpty) {
      System.err.println(
        s"[overlap] no spans to derive a bin width from - using ${FallbackBinUs}us")
      return FallbackBinUs
    }
    // clamp BEFORE the power-of-two rounding: a p90 span past 2^62us
    // would overflow `floorPow << 1` to Long.MIN_VALUE and resolve the
    // clamp to MinBinUs — the worst-direction width for exactly the
    // giant-interval degenerate case the clamp exists for
    val raw = math.min(math.max(q.head, 1.0), MaxBinUs.toDouble)
    val floorPow = java.lang.Long.highestOneBit(math.max(raw.toLong, 1L))
    val pow2 = if (floorPow.toDouble >= raw) floorPow else floorPow << 1
    val derived = math.min(math.max(pow2, MinBinUs), MaxBinUs)
    if (derived != pow2)
      System.err.println(s"[overlap] auto bin width ${pow2}us outside " +
        s"[$MinBinUs, $MaxBinUs]us - clamped to ${derived}us")
    derived
  }

  /** [[binned]] with the bin width derived from the data
    * ([[autoBinUs]]). Any width is CORRECT - the quantile pass only
    * tunes the shuffle/fan-out trade - so the extra input scan is the
    * whole cost of self-tuning. Measured (PLANS.md r11): auto beats
    * the hand-tuned 600s width from 100k rows up (sf1: 2.97s vs
    * 3.81s); below that the quantile job's ~0.3s fixed cost
    * dominates, so tiny report corpora keep the fixed default. */
  def binnedAuto(events: DataFrame,
      equiKey: Option[String] = Some("event_type")): DataFrame = {
    val iv = intervals(events, equiKey)
    binnedIv(iv, autoBinUs(iv))
  }

  /** Time-binned equi-join plan. `binUs` trades shuffle volume
    * (long intervals explode onto more bins) against per-bin fan-out
    * (short bins -> fewer candidate pairs per key). */
  def binned(events: DataFrame, binUs: Long = 600000000L,
      equiKey: Option[String] = Some("event_type")): DataFrame =
    binnedIv(intervals(events, equiKey), binUs)

  private def binnedIv(iv: DataFrame, binUs: Long): DataFrame = {
    val binned = iv.withColumn("bin",
      explode(sequence(expr(s"s DIV $binUs"), expr(s"e DIV $binUs"))))
    val a = binned.alias("a")
    val b = binned.alias("b")
    // count each overlapping pair exactly once: in the bin holding the
    // later start (that bin is covered by both intervals).
    val pairs = a.join(b,
        col("a.k") === col("b.k") &&
        col("a.bin") === col("b.bin") &&
        col("a.id") =!= col("b.id") &&
        col("a.s") < col("b.e") && col("b.s") < col("a.e") &&
        col("a.bin") === expr(s"greatest(a.s, b.s) DIV $binUs"))
      .select(col("a.id").as("id"),
        (least(col("a.e"), col("b.e")) - greatest(col("a.s"), col("b.s"))).as("ov"))
    ratio(iv, pairs)
  }
}
