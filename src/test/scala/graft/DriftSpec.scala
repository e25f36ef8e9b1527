package graft

import graft.ops.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("a source mirroring the mixture scores 0; a disjoint source scores its mixture share") {
    // a and b have IDENTICAL token distributions; z is disjoint —
    // floor-division scale invariance makes the mirror EXACTLY 0.
    // The distance is vs the mixture INCLUDING the source, so z at
    // 50% of the token mass lands at ~1e6 (= 2e6 x its 50% outside
    // share), not 2e6.
    val df = Seq(
      (1L, "x y x", "a"), (2L, "x y x", "b"),
      (3L, "q r s q r s", "z"))
      .toDF("doc_id", "text", "source")
    val byA = Drift.sourceDrift(df.filter($"source" =!= "z"), "text", "source")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byA === Map("a" -> 0L, "b" -> 0L))
    val r = Drift.sourceDrift(df, "text", "source")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(r("z") >= 900000L)
    assert(r("a") > 0L && r("a") < r("z"))
  }

  test("doc and token counts are per-source exact") {
    val df = Seq(
      (1L, "x y", "a"), (2L, "x", "a"), (3L, "x y z", "b"))
      .toDF("doc_id", "text", "source")
    val r = Drift.sourceDrift(df, "text", "source")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r === Map("a" -> (2L, 3L), "b" -> (1L, 3L)))
  }
}
