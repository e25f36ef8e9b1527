package graft

import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}
import graft.ops.Mv
import graft.queries.MiscQueries

/** Incremental-MV and targeted-delete invariants behind
  * `q_incremental_mv` / `q_targeted_delete`.
  */
class MvSpec extends SparkSpec {
  import spark.implicits._

  test("additiveMerge: pass-through, new-key, and merged-key vectors") {
    val base = Seq((1L, 2L, 10L), (2L, 1L, 5L)).toDF("k", "n", "s")
    val delta = Seq((2L, 3L, 7L), (9L, 1L, 1L)).toDF("k", "n", "s")
    val got = Mv.additiveMerge(base, delta, "k", Seq("n", "s"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array((1L, 2L, 10L), (2L, 4L, 12L), (9L, 1L, 1L)))
  }

  test("additiveMerge: NULL aggregate states survive, matching the full recompute") {
    // a sum-state is NULL when every contributing input was NULL;
    // merging it with an absent key (or another NULL state) must stay
    // NULL — zero-coercion would diverge from a full recompute
    val base = Seq((1L, Some(10L)), (2L, None), (3L, None))
      .toDF("k", "s")
    val delta = Seq((2L, None: Option[Long]), (3L, Some(7L)), (4L, None))
      .toDF("k", "s")
    val got = Mv.additiveMerge(base, delta, "k", Seq("s"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got === Array(
      (1L, Some(10L)),  // key absent from delta: passes through
      (2L, None),       // NULL ⊕ NULL = NULL (all inputs were NULL)
      (3L, Some(7L)),   // NULL ⊕ 7 = 7 (sum semantics, not +)
      (4L, None)))      // new key with NULL state stays NULL
  }

  test("incremental MV equals the full recompute on real events") {
    val inc = MiscQueries.qIncrementalMv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val full = Tables.events(spark, sf)
      .select(col("user_id"), Num.cents(col("value")).as("value_c"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value_c").as("sum_c"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(inc === full)
  }

  test("targeted delete removes exactly the subjects' rows") {
    val out = MiscQueries.qTargetedDelete(spark, sf)
      .agg(sum("n")).head().getLong(0)
    val ev = Tables.events(spark, sf)
    val umax = ev.agg(max("user_id")).head().getLong(0)
    val dels = Seq(umax / 7, umax / 2, umax - 1).distinct
    val expect = ev.filter(!col("user_id").isin(dels: _*)).count()
    assert(out === expect)
    assert(expect < ev.count(), "delete set matched no rows")
  }

  test("emptied bucket: a delete that drains a partition removes its dir") {
    // the dynamic-overwrite blind spot in miniature: one bucket holds
    // ONLY a to-be-deleted key; after the erasure pattern (filtered
    // rewrite + explicit removal of drained dirs) the old rows must
    // not be readable
    val dir = java.nio.file.Files.createTempDirectory("graft_drain").toString
    val wh = s"$dir/wh"
    Seq((1L, 100L), (2L, 200L), (9L, 900L)).toDF("u", "v")
      .withColumn("b", expr("u DIV 5"))
      .repartition(col("b")).write.partitionBy("b").parquet(wh)
    // delete u=9: its bucket b=1 becomes empty
    val remaining = spark.read.option("basePath", wh)
      .parquet(s"$wh/b=1")
      .filter(col("u") =!= 9L)
    assert(remaining.isEmpty)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh, "b=1"), true)
    val left = spark.read.parquet(wh).select("u").as[Long].collect().sorted
    assert(left === Array(1L, 2L))
  }
}
