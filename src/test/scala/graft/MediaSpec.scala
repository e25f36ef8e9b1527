package graft

import org.apache.spark.sql.functions._
import graft.functions.{ImagePackedDims, MediaExprs}
import graft.sources.MediaCorpus

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def dims(b: Array[Byte]): Option[(Long, Long)] = {
    val p = ImagePackedDims.packed(b)
    if (p < 0) None else Some((p >>> 32, p & 0xffffffffL))
  }

  test("PNG bytes round-trip: written dims parse back from IHDR") {
    for ((w, h) <- Seq((1, 1), (336, 336), (777, 439), (65535, 2)))
      assert(dims(MediaCorpus.pngBytes(w, h)) === Some((w.toLong, h.toLong)))
    // pinned header vector: signature + IHDR length/type at spec offsets
    val b = MediaCorpus.pngBytes(2, 3)
    assert(b.slice(0, 8).map(_ & 0xff).toSeq ===
      Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a))
    assert(new String(b.slice(12, 16), "US-ASCII") === "IHDR")
    assert(b.slice(16, 24).map(_ & 0xff).toSeq ===
      Seq(0, 0, 0, 2, 0, 0, 0, 3))
  }

  test("JPEG bytes round-trip across varying SOF offsets (real segment walk)") {
    for (((w, h), pad) <- Seq((400, 240) -> 0, (699, 907) -> 13,
        (65535, 65535) -> 41, (336, 1) -> 2))
      assert(dims(MediaCorpus.jpegBytes(w, h, pad)) ===
        Some((w.toLong, h.toLong)), s"pad=$pad")
    // a DHT-shaped marker (FF C4) before SOF must be skipped, not
    // mistaken for a frame header
    val sof = MediaCorpus.jpegBytes(10, 20, 0)
    val withDht = sof.slice(0, 2) ++
      Array(0xff, 0xc4, 0x00, 0x04, 0x00, 0x00).map(_.toByte) ++
      sof.drop(2)
    assert(dims(withDht) === Some((10L, 20L)))
  }

  test("JPEG fill bytes and standalone markers are walked, not misread") {
    // T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
    // fill bytes — common in real-world files. A naive walk reads the
    // byte after the first FF pair as a length field (ADVICE r11).
    val sof = MediaCorpus.jpegBytes(10, 20, 0)
    val fills = Array(0xff, 0xff, 0xff).map(_.toByte)
    val withFill = sof.slice(0, 2) ++ fills ++ sof.drop(2)
    assert(dims(withFill) === Some((10L, 20L)))
    // standalone markers (TEM 0x01, RSTn 0xD0-0xD7) carry NO length
    // field; treating their payload bytes as a length desyncs the walk
    val tem = Array(0xff, 0x01).map(_.toByte)
    val rst = Array(0xff, 0xd3).map(_.toByte)
    assert(dims(sof.slice(0, 2) ++ tem ++ rst ++ sof.drop(2)) ===
      Some((10L, 20L)))
    // fill bytes immediately before the SOF marker itself
    val parts = sof.drop(2) // first marker segment onward
    assert(dims(sof.slice(0, 2) ++ Array(0xff.toByte) ++ parts) ===
      Some((10L, 20L)))
    // trailing fill bytes at end-of-buffer must not index past it
    assert(dims(Array(0xff, 0xd8, 0xff, 0xff, 0xff).map(_.toByte)) === None)
  }

  test("malformed bytes yield NULL, never an exception") {
    assert(dims(Array.emptyByteArray) === None)
    assert(dims("not an image at all".getBytes) === None)
    assert(dims(MediaCorpus.pngBytes(5, 5).take(20)) === None) // truncated
    assert(dims(MediaCorpus.jpegBytes(5, 5, 0).take(3)) === None)
    // JPEG that ends (EOI) before any SOF
    assert(dims(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) === None)
    // expression form: null child and garbage child both null out
    val r = Seq((1L, "junk".getBytes), (2L, null: Array[Byte]))
      .toDF("id", "b")
      .select($"id", MediaExprs.imageDims($"b").as("p"))
      .collect().map(x => x.getLong(0) -> x.isNullAt(1)).toMap
    assert(r === Map(1L -> true, 2L -> true))
  }

  test("ensure() is idempotent and the corpus parses end-to-end via binaryFile") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_t").toString
    MediaCorpus.ensure(dir)
    val first = new java.io.File(dir).listFiles().map(f =>
      f.getName -> f.length()).toMap
    MediaCorpus.ensure(dir) // second call must not rewrite
    val second = new java.io.File(dir).listFiles().map(f =>
      f.getName -> f.length()).toMap
    assert(first === second)
    assert(first.size === MediaCorpus.NumPng + MediaCorpus.NumJpeg)
    val parsed = spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        MediaExprs.imageDims(col("content")).as("p"))
      .collect()
    assert(parsed.forall(!_.isNullAt(1)), "some file failed to parse")
    parsed.foreach { r =>
      val name = r.getString(0)
      val i = name.slice(4, 7).toInt
      val want = if (name.endsWith(".png")) MediaCorpus.pngDims(i)
        else MediaCorpus.jpegDims(i)
      val p = r.getLong(1)
      assert(((p >>> 32).toInt, (p & 0xffffffffL).toInt) === want, name)
    }
  }

  test("q_media_meta returns one row per file with real parsed dims") {
    val out = graft.queries.TrainingQueries.qMediaMeta(spark, sf).collect()
    assert(out.length === MediaCorpus.NumPng + MediaCorpus.NumJpeg)
    // needs-resize rows exist in both formats (nonzero resize signal)
    assert(out.exists(r => r.getAs[String]("fmt") == "png"
      && r.getAs[Long]("out_w") < r.getAs[Long]("width")))
    assert(out.exists(r => r.getAs[String]("fmt") == "jpeg"
      && r.getAs[Long]("out_h") < r.getAs[Long]("height")))
    // and fits-in-box rows pass through unscaled
    assert(out.exists(r => r.getAs[Long]("out_w") == r.getAs[Long]("width")
      && r.getAs[Long]("out_h") == r.getAs[Long]("height")))
  }
}
