package graft

import org.apache.spark.sql.functions._
import graft.functions.{AviWalk, ImagePackedDims}
import graft.sources.MediaCorpus

/** RIFF/AVI container parsing (functions/AviExprs): header/frame
  * vectors against the writer schedule, frame slicing back to exact
  * JPEG bytes, LIST-descent + padding robustness, and the
  * oracle-shaped end-to-end query. */
class AviSpec extends SparkSpec {

  private def meta(b: Array[Byte]): Option[Seq[Long]] =
    Option(AviWalk.meta(b)).map(_.toLongArray().toSeq)

  private def frames(b: Array[Byte]): Option[Seq[(Long, Long, Long)]] =
    Option(AviWalk.frames(b)).map(_.array.toSeq.map { r =>
      val row = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      (row.getLong(0), row.getLong(1), row.getLong(2))
    })

  test("corpus AVI parses to the writer's exact header fields") {
    for (i <- 0 until MediaCorpus.NumAvi) {
      val (w, h) = MediaCorpus.aviDims(i)
      assert(meta(MediaCorpus.aviBytes(i)) === Some(Seq(w.toLong, h.toLong,
        MediaCorpus.aviFrameCount(i).toLong,
        MediaCorpus.aviFps(i).toLong, 1L)), s"file $i")
    }
  }

  test("frame extents slice back to the exact per-frame JPEG bytes") {
    val i = 3
    val b = MediaCorpus.aviBytes(i)
    val fs = frames(b).get
    assert(fs.length === MediaCorpus.aviFrameCount(i))
    assert(fs.map(_._1) === fs.indices.map(_.toLong))
    fs.foreach { case (idx, off, size) =>
      val want = MediaCorpus.aviFrameBytes(i, idx.toInt)
      assert(size === want.length.toLong)
      assert(b.slice(off.toInt, (off + size).toInt) === want, s"frame $idx")
      // each sliced frame is itself a parseable JPEG with the file's dims
      val p = ImagePackedDims.packed(b.slice(off.toInt, (off + size).toInt))
      val (w, h) = MediaCorpus.aviDims(i)
      assert(((p >>> 32).toInt, (p & 0xffffffffL).toInt) === ((w, h)))
    }
  }

  test("malformed and hostile bytes degrade, never throw") {
    assert(meta("not a movie".getBytes) === None)
    assert(frames("not a movie".getBytes) === None)
    assert(meta(MediaCorpus.wavBytes(0)) === None) // RIFF but not AVI
    val good = MediaCorpus.aviBytes(0)
    assert(meta(good.take(40)) === None) // truncated before headers
    // hostile ~2^31 chunk size cannot loop or index negatively
    val evil = good.clone()
    evil(16) = -1; evil(17) = -1; evil(18) = -1; evil(19) = 0x7f
    assert(meta(evil) === None)
    // corruption after the movi list: frames already walked salvage
    val trunc = good.dropRight(16 * MediaCorpus.aviFrameCount(0) + 8 - 4)
    val sal = frames(trunc)
    assert(sal.isEmpty || sal.get.length <= MediaCorpus.aviFrameCount(0))
  }

  test("q_avi_video: sampled frames carry real dims and content hashes") {
    val out = graft.queries.TrainingQueries.qAviVideo(spark, sf).collect()
    val i = 4
    val (w, h) = MediaCorpus.aviDims(i)
    val mine = out.filter(_.getString(0) == f"vid_$i%03d.avi")
    val nf = MediaCorpus.aviFrameCount(i)
    assert(mine.length === (nf + 1) / 2) // every 2nd frame sampled
    mine.foreach { r =>
      assert(r.getAs[Long]("width") === w.toLong)
      assert(r.getAs[Long]("frame_w") === w.toLong)
      assert(r.getAs[Long]("frame_h") === h.toLong)
      assert(r.getAs[Long]("fps") === MediaCorpus.aviFps(i).toLong)
      val f = r.getAs[Long]("frame_idx").toInt
      val want = MediaCorpus.aviFrameBytes(i, f)
      assert(r.getAs[Long]("frame_bytes") === want.length.toLong)
      // md5 over the uppercase hex of the frame bytes (the
      // cross-engine blob-hash idiom; DuckDB md5 is VARCHAR-only)
      val hx = want.map(b => f"${b & 0xff}%02X").mkString
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(hx.getBytes("US-ASCII"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(r.getAs[String]("frame_md5") === md)
    }
  }
}
