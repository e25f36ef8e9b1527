package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.{ZOrder, ZOrderExprs}
import graft.ops.Layout

/** Z-order clustering evidence: per-file value spreads are what
  * parquet writes into its min/max footer stats, so "narrow spread in
  * both dimensions per file" IS the row-group-pruning property — the
  * footer of a file whose y-range is [48, 63] is skipped by
  * `y <= 7` without touching a data page.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: known values, per-dimension monotonicity, loud domain") {
    assert(ZOrder.interleave(0L, 0L) === 0L)
    assert(ZOrder.interleave(1L, 0L) === 1L)
    assert(ZOrder.interleave(0L, 1L) === 2L)
    assert(ZOrder.interleave(3L, 5L) === 39L)
    // monotone in each dimension with the other fixed
    val vals = Seq(0L, 1L, 7L, 100L, 12345L, (1L << 31) - 1)
    vals.sliding(2).foreach { case Seq(lo, hi) =>
      assert(ZOrder.interleave(lo, 42L) < ZOrder.interleave(hi, 42L))
      assert(ZOrder.interleave(42L, lo) < ZOrder.interleave(42L, hi))
    }
    assertThrows[IllegalArgumentException](ZOrder.interleave(-1L, 0L))
    assertThrows[IllegalArgumentException](ZOrder.interleave(1L << 31, 0L))
  }

  test("expression matches the driver function on a frame") {
    val df = Seq((3L, 5L), (0L, 0L), (1000L, 1L)).toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrderExprs.interleaveBits(col("a"), col("b")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === ZOrder.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("z-order layout bounds per-file spread in BOTH dims; linear sort only its leading dim") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    // a 64 x 64 grid, one row per cell
    val grid = (0 until 4096).map(i => (i % 64L, i / 64L)).toDF("x", "y")
    Layout.zorderWrite(grid, col("x"), col("y"), nFiles = 16, s"$dir/z")
    Layout.linearWrite(grid, col("x"), nFiles = 16, s"$dir/lin")

    def spreads(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .agg(avg("sx"), avg("sy"), count(lit(1))).head()

    val z = spreads(s"$dir/z")
    val lin = spreads(s"$dir/lin")
    // linear: x-files are narrow slivers but y spans the full range
    assert(lin.getDouble(1) > 55.0, s"linear y spread: $lin")
    // z-order: BOTH dims bounded well below the full range per file
    assert(z.getDouble(0) < 32.0, s"zorder x spread: $z")
    assert(z.getDouble(1) < 32.0, s"zorder y spread: $z")

    // the pruning consequence: a y-slice query touches a strict
    // subset of z-ordered files, but EVERY linearly-sorted file
    def filesTouched(path: String) = spark.read.parquet(path)
      .filter(col("y") < 8).select(input_file_name()).distinct().count()
    val zFiles = filesTouched(s"$dir/z")
    val linFiles = filesTouched(s"$dir/lin")
    assert(linFiles === 16L)
    assert(zFiles < 8L, s"z files touched: $zFiles")
  }
}
