package graft

import graft.ops.Curriculum

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def bins(nBins: Int, width: Long, vals: Long*): Map[Long, Long] =
    Curriculum.equalFreqBins(
        vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("doc_id", "score"),
        "score", nBins, width)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap

  test("distinct values at unit width cut into exact quartiles") {
    val b = bins(4, 1L, 10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L)
    assert(b === Map(10L -> 1L, 20L -> 1L, 30L -> 2L, 40L -> 2L,
      50L -> 3L, 60L -> 3L, 70L -> 4L, 80L -> 4L))
  }

  test("equal scores never split across bins (value-stable, unlike ntile)") {
    val b = bins(2, 1L, 5L, 5L, 5L, 9L)
    assert(b(5L) === 1L && b(9L) === 2L)
    val all = bins(4, 1L, 7L, 7L, 7L, 7L)
    assert(all === Map(7L -> 1L))
  }

  test("bucket granularity merges near ties into one bin") {
    // width 10: 11 and 19 share a bucket, so they share a bin even
    // though exact quartiles would split them
    val b = bins(2, 10L, 11L, 19L, 25L, 27L)
    assert(b(11L) === b(19L))
    assert(b(25L) === 2L && b(27L) === 2L)
  }

  test("bin count respects nBins and skewed mass lands low") {
    val b = bins(4, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 100L)
    assert(b(1L) === 1L && b(100L) === 4L)
  }

  test("multi-column single pass ≡ chained single-column calls") {
    // the RFM shape: three cuts over one frame, mixed widths — the
    // one-pass variant must reproduce the chained calls bin for bin
    val df = (1L to 97L).map(i =>
        (i, i % 13L, (i * 7L) % 29L, i * 1000L))
      .toDF("id", "a", "b", "c")
    val chained = Curriculum.equalFreqBins(
        Curriculum.equalFreqBins(
          Curriculum.equalFreqBins(df, "a", 4, 1L)
            .withColumnRenamed("bin", "a_bin"),
          "b", 4, 2L).withColumnRenamed("bin", "b_bin"),
        "c", 4, 5000L).withColumnRenamed("bin", "c_bin")
      .select("id", "a_bin", "b_bin", "c_bin")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val multi = Curriculum.equalFreqBinsMulti(df, Seq(
        ("a", "a_bin", 1L), ("b", "b_bin", 2L), ("c", "c_bin", 5000L)),
        nBins = 4)
      .select("id", "a_bin", "b_bin", "c_bin")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(multi === chained)
  }
}
