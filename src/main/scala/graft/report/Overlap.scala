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

  /** Time-binned equi-join plan. `binUs` trades shuffle volume
    * (long intervals explode onto more bins) against per-bin fan-out
    * (short bins -> fewer candidate pairs per key). */
  def binned(events: DataFrame, binUs: Long = 600000000L,
      equiKey: Option[String] = Some("event_type")): DataFrame = {
    val iv = intervals(events, equiKey)
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
