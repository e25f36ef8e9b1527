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
