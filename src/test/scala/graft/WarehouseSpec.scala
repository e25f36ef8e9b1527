package graft

import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}
import graft.queries.MiscQueries

/** Warehouse-maintenance invariants behind the round-14 layout
  * entries: the backfill touches exactly its window, the compactor
  * respects its records-per-file bound, and the z-order entry's
  * per-file spans really are narrow in BOTH dimensions (the property
  * the footer-gated oracle output encodes).
  */
class WarehouseSpec extends SparkSpec {

  private val dayUs = 86400L * 1000000L

  test("q_backfill: window days doubled, out-of-window days byte-equal to raw") {
    val out = MiscQueries.qBackfill(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val raw = Tables.events(spark, sf)
      .select(expr(s"ts_us DIV $dayUs").as("d"),
        Num.cents(col("value")).as("value_c"))
      .groupBy("d").agg(count(lit(1)).as("n"), sum("value_c").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === raw.keySet)
    assert(raw.keys.exists(_ % 4 == 1), "no day in the backfill window")
    raw.foreach { case (d, (n, s)) =>
      assert(out(d)._1 === n, s"row count moved for day $d")
      val expected = if (d % 4 == 1) 2 * s else s
      assert(out(d)._2 === expected, s"sum wrong for day $d")
    }
  }

  test("compaction write splits at exactly maxRecordsPerFile per task") {
    val dir = java.nio.file.Files.createTempDirectory("graft_maxrec").toString
    import spark.implicits._
    (0L until 2500L).map(i => (i, i % 3)).toDF("id", "g")
      .repartition(col("g"))
      .write.option("maxRecordsPerFile", 400L)
      .partitionBy("g").parquet(s"$dir/out")
    val perFile = spark.read.parquet(s"$dir/out")
      .withColumn("fn", input_file_name())
      .groupBy("g", "fn").agg(count(lit(1)).as("n"))
      .collect()
    assert(perFile.forall(_.getLong(2) <= 400L),
      "a compacted file exceeds the records-per-file bound")
    // one task per partition value => minimal packing: ceil(n/400)
    perFile.groupBy(_.getInt(0)).foreach { case (g, files) =>
      val rows = files.map(_.getLong(2)).sum
      assert(files.length === ((rows + 399) / 400).toInt,
        s"partition g=$g not minimally packed")
    }
  }

  test("q_zorder: per-file spans narrow in BOTH dimensions on real keys") {
    val rows = MiscQueries.qZorder(spark, sf).collect()
    val (oMin, oMax) = (rows.map(_.getLong(2)).min, rows.map(_.getLong(3)).max)
    val (pMin, pMax) = (rows.map(_.getLong(4)).min, rows.map(_.getLong(5)).max)
    val oRange = math.max(1L, oMax - oMin)
    val pRange = math.max(1L, pMax - pMin)
    // each z-range owns a 16x16 bucket block of the 64x64 grid, so a
    // file's span in each dimension is ~1/4 of the range — far from
    // the full-range secondary dimension a linear sort would leave
    val avgO = rows.map(r => r.getLong(3) - r.getLong(2)).sum.toDouble / rows.length
    val avgP = rows.map(r => r.getLong(5) - r.getLong(4)).sum.toDouble / rows.length
    assert(avgO < 0.45 * oRange, s"orderkey spans not clustered: $avgO / $oRange")
    assert(avgP < 0.45 * pRange, s"partkey spans not clustered: $avgP / $pRange")
  }
}
