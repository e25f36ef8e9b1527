package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.report._

class OverlapSpec extends SparkSpec {
  test("binned plan matches naive theta-join plan exactly") {
    val ev = Tables.events(spark, sf)
    val naive = Overlap.naive(ev).collect()
    val binned = Overlap.binned(ev).collect()
    assert(naive.length === binned.length)
    naive.zip(binned).foreach { case (n, b) => assert(n === b) }
  }
  test("overlap bounds: 0 <= ratio, ov_us >= 0") {
    val r = Overlap.binned(Tables.events(spark, sf))
    assert(r.filter(col("ov_us") < 0 || col("overlap_ratio") < 0).count() === 0)
  }
  test("disjoint intervals have zero overlap") {
    import spark.implicits._
    val ev = Seq(
      (1L, 0L, "a", 10.0), (2L, 20000000L, "a", 5.0), // disjoint in time
      (3L, 0L, "b", 10.0) // different key
    ).toDF("event_id", "ts_us", "event_type", "value")
    val r = Overlap.naive(ev).collect()
    assert(r.forall(_.getLong(1) == 0L))
  }
  test("identical intervals overlap fully (ratio = n-1)") {
    import spark.implicits._
    val ev = (1L to 4L).map(i => (i, 0L, "a", 10.0))
      .toDF("event_id", "ts_us", "event_type", "value")
    val r = Overlap.binned(ev).collect()
    assert(r.forall(_.getDouble(2) == 3.0))
  }
  test("autoBinUs derives p90 span rounded up to a power of two, loudly clamped") {
    import spark.implicits._
    def iv(spansUs: Seq[Long]) = Overlap.intervals(
      spansUs.zipWithIndex.map { case (sp, i) =>
        (i.toLong, 0L, "a", sp / 1e6) }
        .toDF("event_id", "ts_us", "event_type", "value"))
    // uniform 100s spans: p90 = 1e8 -> next pow2 = 2^27 us
    assert(Overlap.autoBinUs(iv(Seq.fill(20)(100000000L))) === 134217728L)
    // exact power of two stays put (no needless doubling)
    assert(Overlap.autoBinUs(iv(Seq.fill(20)(134217728L))) === 134217728L)
    // a tail of giants does not drag the width past p90
    assert(Overlap.autoBinUs(
      iv(Seq.fill(95)(100000000L) ++ Seq.fill(2)(86400000000L)))
      === 134217728L)
    // degenerate all-zero spans clamp UP to the 1s floor
    assert(Overlap.autoBinUs(iv(Seq.fill(10)(0L))) === Overlap.MinBinUs)
    // one multi-day span clamps DOWN to the 1-day ceiling
    assert(Overlap.autoBinUs(iv(Seq.fill(10)(5L * 86400000000L)))
      === Overlap.MaxBinUs)
  }
  test("binnedAuto equals the naive plan (any derived width is correct)") {
    val ev = Tables.events(spark, sf)
    val naive = Overlap.naive(ev).collect()
    val auto = Overlap.binnedAuto(ev).collect()
    assert(naive.length === auto.length)
    naive.zip(auto).foreach { case (n, b) => assert(n === b) }
  }
  test("zero-length runs ratio 0, not a division error (real sf0.1 rows hit this)") {
    import spark.implicits._
    val ev = Seq(
      (1L, 5000000L, "a", 0.0), // zero length, strictly inside 2
      (2L, 0L, "a", 10.0),
      (3L, 30000000L, "a", 0.0)) // zero length, disjoint
      .toDF("event_id", "ts_us", "event_type", "value")
    Seq(Overlap.naive(ev), Overlap.binned(ev)).foreach { plan =>
      val r = plan.collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
      assert(r(1L) === 0.0 && r(3L) === 0.0)
      assert(r(2L) === 0.0) // the contained zero-length run adds 0 µs
    }
  }
}

class RunRecordsSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  test("sentinel fill poisons missing cells") {
    import spark.implicits._
    val a = Seq((1L, 10L)).toDF("id", "x")
    val b = Seq((2L, 20L)).toDF("id", "y")
    val u = RunRecords.unionFill(Seq(a, b)).orderBy("id").collect()
    assert(u(0) === Row(1L, 10L, RunRecords.Sentinel))
    assert(u(1) === Row(2L, RunRecords.Sentinel, 20L))
  }
  test("invalidator keeps null/absent keys") {
    import spark.implicits._
    val df = Seq((1L, "ok"), (2L, "bad"), (3L, null))
      .toDF("id", "status")
    val kept = RunRecords.invalidatorFilter(df, Map("status" -> "bad", "absent" -> "x"))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L))
  }
  test("sorted columns") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF("b", "a", "c")
    assert(RunRecords.sortedColumns(df).columns.toSeq === Seq("a", "b", "c"))
  }
}

class GroupsSpec extends SparkSpec {
  test("section emits uses/avg/sum/list with reference naming") {
    import spark.implicits._
    val df = Seq(
      ("g1", 100L, 1L, "u1"), ("g1", 200L, 2L, "u2"), ("g2", 300L, 3L, "u1"))
      .toDF("cat", "metric", "extra", "who")
    val out = Groups.section(df, Groups.GroupConfig(
      "cat", showAsSum = Set("extra"), showAsList = Set("who")))
    // aggregates interleave in base-name sort order (extra < metric < who)
    assert(out.columns.toSeq ===
      Seq("cat", "uses", "sum_extra", "avg_metric", "who_list"))
    val r = out.collect()
    assert(r(0).getString(0) === "g1" && r(0).getLong(1) === 2L)
    assert(r(0).getLong(2) === 3L)
    assert(r(0).getDouble(3) === 150.0)
    assert(r(0).getString(4) === "u1;u2")
  }
}
