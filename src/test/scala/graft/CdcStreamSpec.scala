package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.SnapTable
import graft.streaming.CdcStream

/** CDC-consumer contract behind `q_cdc_mv_stream`: the cursor lives
  * in the MV table's own commit log (tags), so a consumer resumes
  * mid-stream, folds only what is new, and replays nothing — and the
  * folded view always equals the source's latest state rolled up.
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  // source state grain: (g, k) cells with value v; MV grain: per-g sums
  private def state(rows: Seq[(String, Long, Long)]): DataFrame =
    rows.toDF("g", "k", "v")
      .withColumn("sk", concat_ws(":", col("g"), col("k")))

  private def drain(src: String, mv: String): Int =
    CdcStream.runMaintain(spark, src, mv,
      key = "sk", value = "v", carry = Seq("g"),
      contrib = d => d.groupBy(col("g")).agg(
        sum(coalesce(col("new_v"), lit(0L)) -
          coalesce(col("old_v"), lit(0L))).as("v")),
      mvKey = "g", mvCols = Seq("v"))

  private def mvRows(mv: String): Seq[(String, Long)] =
    SnapTable.read(spark, mv).orderBy("g")
      .as[(String, Long)].collect().toSeq

  test("resume mid-stream: only new versions fold; redelivery folds zero") {
    val tmp = Files.createTempDirectory("graft_cdc").toString
    val (src, mv) = (s"$tmp/src", s"$tmp/mv")
    SnapTable.commit(spark,
      state(Seq(("a", 1L, 10L), ("b", 1L, 5L))), src, "overwrite")
    SnapTable.commit(spark,
      state(Seq(("a", 1L, 10L), ("a", 2L, 7L), ("b", 1L, 6L))),
      src, "overwrite")
    assert(drain(src, mv) === 2)
    assert(mvRows(mv) === Seq(("a", 17L), ("b", 6L)))
    // caught up: nothing to fold
    assert(drain(src, mv) === 0)
    // two more source states land (one with a retraction of b)
    SnapTable.commit(spark,
      state(Seq(("a", 1L, 12L), ("a", 2L, 7L), ("b", 1L, 6L))),
      src, "overwrite")
    SnapTable.commit(spark,
      state(Seq(("a", 1L, 12L), ("a", 2L, 7L))), src, "overwrite")
    // the resumed consumer folds exactly the two new versions
    assert(drain(src, mv) === 2)
    assert(SnapTable.versions(spark, mv) === Seq(1, 2, 3, 4))
    assert(mvRows(mv) === Seq(("a", 19L), ("b", 0L)))
    // and the folded view equals the latest source state rolled up
    val direct = SnapTable.read(spark, src).groupBy("g")
      .agg(sum("v").as("v")).orderBy("g")
      .as[(String, Long)].collect().toSeq
    assert(mvRows(mv).filter(_._2 != 0L) === direct)
  }

  test("CDC gap: source vacuumed past unconsumed history refuses, never double-counts") {
    val tmp = Files.createTempDirectory("graft_cdc_gap").toString
    val (src, mv) = (s"$tmp/src", s"$tmp/mv")
    SnapTable.commit(spark, state(Seq(("a", 1L, 1L))), src, "overwrite")
    assert(drain(src, mv) === 1)
    // the consumer lags; the source moves on and vacuums past v2
    SnapTable.commit(spark, state(Seq(("a", 1L, 5L))), src, "overwrite")
    SnapTable.commit(spark, state(Seq(("a", 1L, 7L))), src, "overwrite")
    SnapTable.vacuum(spark, src, keep = 1) // v1, v2 gone; v2 never consumed
    val before = mvRows(mv)
    val ex = intercept[IllegalArgumentException] { drain(src, mv) }
    assert(ex.getMessage.contains("CDC gap"))
    // a refused drain folds nothing — silently bootstrapping the v3
    // state onto the standing MV would have double-counted key a
    assert(mvRows(mv) === before)
  }

  test("MV-side vacuum cannot trigger a double-fold: the head tag is the cursor") {
    val tmp = Files.createTempDirectory("graft_cdc_mvvac").toString
    val (src, mv) = (s"$tmp/src", s"$tmp/mv")
    SnapTable.commit(spark, state(Seq(("a", 1L, 1L))), src, "overwrite")
    SnapTable.commit(spark, state(Seq(("a", 1L, 3L))), src, "overwrite")
    SnapTable.commit(spark, state(Seq(("a", 1L, 3L), ("b", 1L, 4L))),
      src, "overwrite")
    assert(drain(src, mv) === 3)
    val settled = mvRows(mv)
    // MV retention retires the OLD tag manifests (src-v1, src-v2);
    // only the head (tagged src-v3) survives. The per-version tag
    // scan alone now can't tell v1/v2 "consumed, tag retired" from
    // "never consumed" — the head cursor can, and must refuse the
    // re-fold that would double-count key a into standing state.
    SnapTable.vacuum(spark, mv, keep = 1)
    assert(drain(src, mv) === 0)
    assert(mvRows(mv) === settled)
    // and the cursor still advances past the vacuum: a NEW source
    // version folds exactly once
    SnapTable.commit(spark, state(Seq(("a", 1L, 10L), ("b", 1L, 4L))),
      src, "overwrite")
    assert(drain(src, mv) === 1)
    assert(mvRows(mv) === Seq(("a", 10L), ("b", 4L)))
  }

  test("untagged MV compaction does not reset the cursor; a cursor-less MV refuses to fold") {
    val tmp = Files.createTempDirectory("graft_cdc_untag").toString
    val (src, mv) = (s"$tmp/src", s"$tmp/mv")
    SnapTable.commit(spark, state(Seq(("a", 1L, 1L))), src, "overwrite")
    SnapTable.commit(spark, state(Seq(("a", 1L, 3L))), src, "overwrite")
    assert(drain(src, mv) === 2)
    val settled = mvRows(mv)
    // an UNTAGGED maintenance rewrite lands on the MV (a compaction
    // has no source cursor to carry) and becomes the head; MV vacuum
    // then retires the oldest tag manifest. The cursor must come from
    // the newest live src-v* tag BELOW the head, not the head alone —
    // or v1 would re-fold and double-count key a.
    SnapTable.commit(spark, SnapTable.read(spark, mv), mv, "overwrite")
    SnapTable.vacuum(spark, mv, keep = 2) // keeps untagged head + src-v2
    assert(drain(src, mv) === 0)
    assert(mvRows(mv) === settled)
    // retention misconfigured: ONLY untagged commits survive — the
    // cursor is gone and a fold could double-count; refuse loudly
    SnapTable.commit(spark, SnapTable.read(spark, mv), mv, "overwrite")
    SnapTable.vacuum(spark, mv, keep = 1)
    val e = intercept[IllegalArgumentException] { drain(src, mv) }
    assert(e.getMessage.contains("cursor"))
  }

  test("stand-watch: a ProcessingTime watcher folds versions that land WHILE it runs") {
    val tmp = Files.createTempDirectory("graft_cdc_watch").toString
    val (src, mv) = (s"$tmp/src", s"$tmp/mv")
    SnapTable.commit(spark, state(Seq(("a", 1L, 1L))), src, "overwrite")
    val folded = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = CdcStream.watch(spark, src, mv,
      key = "sk", value = "v", carry = Seq("g"),
      contrib = d => d.groupBy(col("g")).agg(
        sum(coalesce(col("new_v"), lit(0L)) -
          coalesce(col("old_v"), lit(0L))).as("v")),
      mvKey = "g", mvCols = Seq("v"),
      checkpoint = s"$tmp/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"),
      onVersion = (_, _) => { folded.incrementAndGet(); () })
    try {
      def await(n: Int): Unit = {
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (folded.get() < n) {
          require(System.nanoTime() < deadline,
            s"watcher stalled at ${folded.get()} of $n folds")
          Thread.sleep(100)
        }
      }
      await(1)
      // versions landing WHILE the watcher stands: each gets folded
      SnapTable.commit(spark, state(Seq(("a", 1L, 5L), ("b", 1L, 2L))),
        src, "overwrite")
      await(2)
      SnapTable.commit(spark, state(Seq(("a", 1L, 5L))), src, "overwrite")
      await(3)
    } finally q.stop()
    assert(mvRows(mv) === Seq(("a", 5L), ("b", 0L)))
    // the standing view equals the live source's rollup
    val direct = SnapTable.read(spark, src).groupBy("g")
      .agg(sum("v").as("v")).orderBy("g")
      .as[(String, Long)].collect().toSeq
    assert(mvRows(mv).filter(_._2 != 0L) === direct)
  }

  test("fresh consumer on a vacuumed source bootstraps from the first available state") {
    val tmp = Files.createTempDirectory("graft_cdc_vac").toString
    val (src, mv) = (s"$tmp/src", s"$tmp/mv")
    SnapTable.commit(spark, state(Seq(("a", 1L, 1L))), src, "overwrite")
    SnapTable.commit(spark, state(Seq(("a", 1L, 2L))), src, "overwrite")
    SnapTable.commit(spark,
      state(Seq(("a", 1L, 2L), ("b", 1L, 9L))), src, "overwrite")
    SnapTable.vacuum(spark, src, keep = 2) // v1 gone before any consumer saw it
    val folded = drain(src, mv)
    assert(folded === 2, "bootstrap must fold the first AVAILABLE state fully")
    assert(mvRows(mv) === Seq(("a", 2L), ("b", 9L)))
  }
}
