package graft

import graft.ops.{Bpe, Chunk}

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def rows(c: Int, s: Int, ids: Seq[Long]*) = {
    val df = ids.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("doc_id", "ids")
    Chunk.chunkRows(df, chunkSize = c, stride = s)
      .orderBy("doc_id", "chunk_id", "cpos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("disjoint stride reassembles the stream exactly, short tail kept") {
    val r = rows(3, 3, Seq(10L, 11L, 12L, 13L, 14L))
    assert(r.toSeq === Seq(
      (0L, 0L, 0L, 10L), (0L, 0L, 1L, 11L), (0L, 0L, 2L, 12L),
      (0L, 1L, 0L, 13L), (0L, 1L, 1L, 14L)))
  }

  test("overlapping windows repeat the overlapped positions") {
    val r = rows(4, 2, Seq(0L, 1L, 2L, 3L, 4L, 5L))
    // starts 0, 2, 4 -> [0..3], [2..5], [4..5]
    assert(r.map(_._4).toSeq === Seq(0L, 1L, 2L, 3L, 2L, 3L, 4L, 5L, 4L, 5L))
    assert(r.map(_._2).distinct.toSeq === Seq(0L, 1L, 2L))
  }

  test("zero-token docs yield no chunks; others unaffected") {
    val r = rows(2, 2, Seq.empty[Long], Seq(7L))
    assert(r.toSeq === Seq((1L, 0L, 0L, 7L)))
  }

  test("tokenIdChunks at stride == chunkSize flattens to the byteTokenIds stream") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val chunked = Chunk.tokenIdChunks(df, "text", "doc_id",
        chunkSize = 4, stride = 4, merges = Bpe.fixtureMergesByteLevel)
      .orderBy("chunk_id", "cpos")
      .select("token_id").as[Long].collect().toSeq
    val direct = df.select(
        org.apache.spark.sql.functions.explode(
          Bpe.byteTokenIds(org.apache.spark.sql.functions.col("text"),
            Bpe.fixtureMergesByteLevel)))
      .as[Int].collect().toSeq.map(_.toLong)
    assert(chunked === direct)
  }

  test("chunkSize and stride must be positive") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunk.tokenIdChunks(df, "text", "doc_id", 0, 1, Nil)
    }
    intercept[IllegalArgumentException] {
      Chunk.tokenIdChunks(df, "text", "doc_id", 4, 0, Nil)
    }
  }
}
