package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.SnapTable

/** Snapshot-table contract: manifests are the only truth readers see,
  * append shares files instead of copying data, history stays
  * readable, and the change feed emits exactly the moved keys.
  */
class SnapTableSpec extends SparkSpec {
  import spark.implicits._

  test("commit/read: overwrite replaces, append shares prior files, history readable") {
    val tbl = Files.createTempDirectory("graft_snap").toString + "/t"
    val v1 = SnapTable.commit(spark,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), tbl, "overwrite")
    val v2 = SnapTable.commit(spark,
      Seq((3L, 30L)).toDF("k", "v"), tbl, "append")
    val v3 = SnapTable.commit(spark,
      Seq((9L, 90L)).toDF("k", "v"), tbl, "overwrite")
    assert((v1, v2, v3) === ((1, 2, 3)))
    assert(SnapTable.read(spark, tbl, Some(1)).count() === 2L)
    assert(SnapTable.read(spark, tbl, Some(2)).count() === 3L)
    assert(SnapTable.read(spark, tbl, Some(3)).count() === 1L)
    // latest = v3
    assert(SnapTable.read(spark, tbl).agg(sum("v")).head().getLong(0) === 90L)
    // append carried v1's files verbatim — no data was copied
    val f1 = SnapTable.files(spark, tbl, 1).toSet
    val f2 = SnapTable.files(spark, tbl, 2).toSet
    assert(f1.subsetOf(f2) && (f2 -- f1).forall(_.startsWith("data/b2/")))
  }

  test("torn commit: staged data without a manifest is invisible") {
    val tbl = Files.createTempDirectory("graft_snap_torn").toString + "/t"
    SnapTable.commit(spark, Seq((1L, 1L)).toDF("k", "v"), tbl, "overwrite")
    // a writer crashed after its data files, before its manifest
    Seq((7L, 7L)).toDF("k", "v").write.parquet(s"$tbl/data/b2")
    assert(SnapTable.versions(spark, tbl) === Seq(1))
    assert(SnapTable.read(spark, tbl).count() === 1L)
    // the next committer claims version 2 with its OWN staging dir
    val v = SnapTable.commit(spark,
      Seq((2L, 2L)).toDF("k", "v"), tbl, "append")
    assert(v === 2)
    assert(SnapTable.read(spark, tbl, Some(2)).count() === 2L)
  }

  test("vacuum: reference counting over manifests, not file ages") {
    val tbl = Files.createTempDirectory("graft_snap_vac").toString + "/t"
    SnapTable.commit(spark, Seq((1L, 10L)).toDF("k", "v"), tbl, "overwrite")
    SnapTable.commit(spark, Seq((2L, 20L)).toDF("k", "v"), tbl, "append")
    SnapTable.commit(spark, Seq((3L, 30L)).toDF("k", "v"), tbl, "overwrite")
    // keep=2 retires v1 — but v2 APPEND still references v1's batch,
    // so an age-based GC would corrupt v2; reference counting must not
    val removed = SnapTable.vacuum(spark, tbl, keep = 2)
    assert(removed === 0, "vacuum deleted a file a kept manifest references")
    assert(SnapTable.versions(spark, tbl) === Seq(2, 3))
    assert(SnapTable.read(spark, tbl, Some(2)).count() === 2L)
    // keep=1: only v3 survives, and b1/b2's files are now garbage
    assert(SnapTable.vacuum(spark, tbl, keep = 1) > 0)
    assert(SnapTable.versions(spark, tbl) === Seq(3))
    assert(SnapTable.read(spark, tbl).agg(sum("v")).head().getLong(0) === 30L)
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tbl, "data/b1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tbl, "data/b2")))
  }

  test("vacuum crash order: manifests retire before data, so a mid-crash never breaks a promised read") {
    val tbl = Files.createTempDirectory("graft_snap_crash").toString + "/t"
    SnapTable.commit(spark, Seq((1L, 10L)).toDF("k", "v"), tbl, "overwrite")
    SnapTable.commit(spark, Seq((2L, 20L)).toDF("k", "v"), tbl, "overwrite")
    SnapTable.commit(spark, Seq((3L, 30L)).toDF("k", "v"), tbl, "overwrite")
    // simulate the crash window: the manifest-retirement half of
    // vacuum(keep=2) ran, the file-deletion half did not
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tbl, "manifest-v00001.txt"), false)
    // every version the table still PROMISES is fully readable
    assert(SnapTable.versions(spark, tbl) === Seq(2, 3))
    assert(SnapTable.read(spark, tbl, Some(2)).count() === 1L)
    assert(SnapTable.read(spark, tbl, Some(3)).count() === 1L)
    // and the interrupted GC rolls forward: a re-run reclaims v1's
    // now-orphaned batch
    assert(SnapTable.vacuum(spark, tbl, keep = 2) > 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tbl, "data/b1")))
    assert(SnapTable.read(spark, tbl, Some(2)).count() === 1L)
  }

  test("concurrent commit: a second claimant of the same version fails loudly") {
    val tbl = Files.createTempDirectory("graft_snap_cc").toString + "/t"
    SnapTable.commit(spark, Seq((1L, 1L)).toDF("k", "v"), tbl, "overwrite")
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the race window: both writers derived v=2 from the same head;
    // the winner's manifest lands first...
    SnapTable.claim(fs, tbl, 2, Seq("data/b2/winner.parquet"))
    // ...so the loser's claim of the SAME version must refuse, never
    // overwrite the winner's manifest
    val ex = intercept[java.io.IOException] {
      SnapTable.claim(fs, tbl, 2, Seq("data/b2/loser.parquet"))
    }
    assert(ex.getMessage.contains("concurrent commit"))
    assert(SnapTable.files(spark, tbl, 2) === Seq("data/b2/winner.parquet"))
    // and the public commit path, arriving after the winner, simply
    // claims the NEXT version
    assert(SnapTable.commit(spark,
      Seq((3L, 3L)).toDF("k", "v"), tbl, "overwrite") === 3)
  }

  test("diff: I/D/U emitted, unchanged suppressed") {
    val old = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val neu = Seq((2L, 20L), (3L, 31L), (4L, 40L)).toDF("k", "v")
    val got = SnapTable.diff(old, neu, "k", "v")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getString(3)))
    assert(got === Array(
      (1L, Some(10L), None, "D"),
      (3L, Some(30L), Some(31L), "U"),
      (4L, None, Some(40L), "I")))
  }
}
