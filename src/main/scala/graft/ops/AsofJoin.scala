package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the same
  * key and the greatest timestamp <= the left row's timestamp
  * (inclusive; left rows with no prior right row get nulls).
  *
  * Spark has no ASOF JOIN operator, and the naive spelling — a range
  * theta-join plus a per-left-row window — degenerates to a broadcast
  * nested loop at scale. This implementation uses the union + running
  * `last(ignoreNulls)` formulation instead: tag both inputs, union
  * them into one stream, sort per key by (ts, side, tiebreak) so a
  * right row at the exact left timestamp sorts first (inclusive
  * semantics), and carry the most recent right payload forward with
  * one running window. Cost: ONE shuffle on the join key, no join
  * operator at all — the same plan shape at 100 TB, with per-key
  * partitions bounded by that key's event count.
  */
object AsofJoin {

  /** @param key   equi-join key column (present on both sides)
    * @param ts    ordering timestamp column (both sides, same unit,
    *              numeric)
    * @param tie   deterministic tiebreak column for equal timestamps
    *              (both sides; e.g. an event id)
    * @param leftOut  left columns to emit, unchanged
    * @param rightOut right columns to emit, prefixed `asof_`
    * @param forward false (default): latest right row at-or-before
    *                each left row. true: EARLIEST right row
    *                at-or-after — the "next event" direction (e.g.
    *                funnel conversion). Implemented by negating the
    *                sort timestamp; everything else is the same
    *                single-shuffle plan.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, tie: String,
      leftOut: Seq[String], rightOut: Seq[String],
      forward: Boolean = false): DataFrame = {
    val lStruct = struct(leftOut.map(col): _*)
    val rStruct = struct(rightOut.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val sortTs = if (forward) -col(ts) else col(ts)

    val shapedR = right.select(
      col(key).as("_k"), sortTs.as("_ts"), col(tie).as("_tie"),
      lit(0).as("_side"),
      lit(null).cast(lType).as("_l"), rStruct.as("_r"))
    val shapedL = left.select(
      col(key).as("_k"), sortTs.as("_ts"), col(tie).as("_tie"),
      lit(1).as("_side"),
      lStruct.as("_l"), lit(null).cast(rType).as("_r"))

    // among right rows at the SAME timestamp, backward keeps the max
    // tie (latest) and forward must mirror it with the MIN tie
    // (earliest) — so the tie direction flips with the mode
    val sortTie = if (forward) col("_tie").desc else col("_tie").asc
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_side").asc, sortTie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val outCols: Seq[Column] =
      leftOut.map(c => col(s"_l.$c").as(c)) ++
        rightOut.map(c => col(s"_r_asof.$c").as(s"asof_$c"))
    shapedR.unionByName(shapedL)
      .withColumn("_r_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(outCols: _*)
  }

  /** Hot-key-safe as-of join: identical semantics to [[asofJoin]],
    * with the per-key running window split across TIME BUCKETS so a
    * pathological key (one user with a billion events) no longer
    * lands on a single task. Salting cannot compose with an
    * order-dependent running window; bucketing by time can, because
    * as-of only ever looks backward:
    *
    *   1. the [[asofJoin]] window runs within (key, bucket) — each
    *      left row gets its best match from its OWN bucket;
    *   2. each (key, bucket)'s last right row (its "tail") is
    *      reduced out — one slim row per bucket;
    *   3. a per-key running window over the tails (#buckets rows,
    *      tiny) carries the latest strictly-earlier-bucket tail to
    *      every left bucket;
    *   4. a left row's answer is its in-bucket match, else its
    *      bucket's carry.
    *
    * Cost: the one big shuffle now keys on (key, bucket) — bounded
    * partitions at any per-key volume — plus two slim passes
    * (bucket-tail reduce, carry join). `bucketWidth` is in the ts
    * column's own unit and trades partition size against the number
    * of carry rows; both directions supported via the same
    * sort-space negation as the base operator. */
  def asofJoinBucketed(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, tie: String,
      leftOut: Seq[String], rightOut: Seq[String],
      bucketWidth: Long, forward: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lStruct = struct(leftOut.map(col): _*)
    val rStruct = struct(rightOut.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val sortTs = if (forward) -col(ts) else col(ts)

    val shapedR = right.select(
      col(key).as("_k"), sortTs.as("_ts"), col(tie).as("_tie"),
      lit(0).as("_side"),
      lit(null).cast(lType).as("_l"), rStruct.as("_r"))
    val shapedL = left.select(
      col(key).as("_k"), sortTs.as("_ts"), col(tie).as("_tie"),
      lit(1).as("_side"),
      lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val bCol = floor(col("_ts") / bucketWidth).cast("long")

    // pass 1: the base operator's window, within (key, bucket)
    val sortTie = if (forward) col("_tie").desc else col("_tie").asc
    val wIn = Window.partitionBy(col("_k"), col("_b"))
      .orderBy(col("_ts").asc, col("_side").asc, sortTie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = shapedR.unionByName(shapedL).withColumn("_b", bCol)
      .withColumn("_r_in", last(col("_r"), ignoreNulls = true).over(wIn))
      .filter(col("_side") === 1)

    // pass 2: each (key, bucket)'s last right row — what the running
    // window would hand the next bucket
    val revTie = if (forward) col("_tie").asc else col("_tie").desc
    val wTail = Window.partitionBy(col("_k"), col("_b"))
      .orderBy(col("_ts").desc, revTie)
    val tails = shapedR.withColumn("_b", bCol)
      .withColumn("_rn", row_number().over(wTail))
      .filter(col("_rn") === 1)
      .select(col("_k"), col("_b"), lit(1).as("_o"), col("_r").as("_tail"))

    // pass 3: strictly-earlier-bucket carry at every left bucket slot
    // (slots order BEFORE tails within a bucket, so a slot's running
    // last never sees its own bucket's tail). Slots are exactly the
    // LEFT side's (key, bucket) pairs — derive them from shapedL
    // directly, not from inBucket, whose lineage would re-run the
    // pass-1 union + window just to be projected away.
    val slots = shapedL.withColumn("_b", bCol)
      .select(col("_k"), col("_b")).distinct()
      .withColumn("_o", lit(0))
      .withColumn("_tail", lit(null).cast(rType))
    val wCarry = Window.partitionBy(col("_k"))
      .orderBy(col("_b").asc, col("_o").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = tails
      .unionByName(slots.select(tails.columns.map(col).toIndexedSeq: _*))
      .withColumn("_carry", last(col("_tail"), ignoreNulls = true).over(wCarry))
      .filter(col("_o") === 0)
      .select(col("_k"), col("_b"), col("_carry"))

    val outCols: Seq[Column] =
      leftOut.map(c => col(s"_l.$c").as(c)) ++
        rightOut.map(c => col(s"_r_asof.$c").as(s"asof_$c"))
    inBucket.join(carries, Seq("_k", "_b"), "left")
      .withColumn("_r_asof", coalesce(col("_r_in"), col("_carry")))
      .select(outCols: _*)
  }
}
