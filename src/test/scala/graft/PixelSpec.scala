package graft

import org.apache.spark.sql.functions._
import graft.functions.{PngRgb, RgbOps}
import graft.sources.MediaCorpus

/** Real PNG pixel decode (functions/MediaExprs.PngRgb) + the RGB
  * plane operators (functions/RgbExprs): decode vectors against the
  * writer's pixel formula, all five RFC 2083 scanline filters via a
  * real Deflater round-trip, crop/resize/stats arithmetic, poison
  * robustness, and the end-to-end oracle-shaped query. */
class PixelSpec extends SparkSpec {
  import spark.implicits._

  test("stored-deflate corpus PNG decodes to the writer's exact pixels") {
    val i = 3
    val (w, h) = MediaCorpus.pixelDims(i)
    val px = PngRgb.decode(MediaCorpus.pngPixelBytes(i))
    assert(px != null && px.length === w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      assert((px(o) & 0xff) === MediaCorpus.pixelR(i, x, y), s"R($x,$y)")
      assert((px(o + 1) & 0xff) === MediaCorpus.pixelG(i, x, y), s"G($x,$y)")
      assert((px(o + 2) & 0xff) === MediaCorpus.pixelB(i, x, y), s"B($x,$y)")
    }
  }

  private def filteredPng(w: Int, h: Int, pixels: Array[Byte],
      filters: Seq[Int]): Array[Byte] =
    PngTestVectors.filteredPng(w, h, pixels, filters)

  test("all five scanline filters + multi-IDAT Deflater stream round-trip") {
    val w = 5; val h = 5
    val pixels = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val png = filteredPng(w, h, pixels, Seq(0, 1, 2, 3, 4))
    val got = PngRgb.decode(png)
    assert(got != null)
    assert(got.toSeq === pixels.toSeq)
  }

  test("malformed bytes degrade to null, never throw") {
    assert(PngRgb.decode("not a png".getBytes) === null)
    assert(PngRgb.decode(MediaCorpus.pngBytes(5, 5)) === null) // no IDAT
    val good = MediaCorpus.pngPixelBytes(0)
    assert(PngRgb.decode(good.take(40)) === null)       // truncated
    val corrupt = good.clone()
    corrupt(good.length - 20) = 0x7f                    // damage IDAT payload
    // either the inflate or the adler check degrades — never a throw
    PngRgb.decode(corrupt)
    // 16-bit depth and interlace are out of contract -> null
    val deep = good.clone(); deep(24) = 16
    assert(PngRgb.decode(deep) === null)
    val inter = good.clone(); inter(28) = 1
    assert(PngRgb.decode(inter) === null)
    // a hostile chunk length cannot index out of bounds — including
    // the ~2^31 class whose Int sum wraps NEGATIVE past a naive
    // bounds check (code-review r12; the TarEntries overflow class)
    val evil = good.clone()
    evil(8) = 0x7f; evil(9) = 0x7f.toByte
    assert(PngRgb.decode(evil) === null)
    val evil2 = good.clone()
    evil2(8) = 0x7f; evil2(9) = -1; evil2(10) = -1; evil2(11) = -1
    assert(PngRgb.decode(evil2) === null)
    // RgbOps guards: hostile dims whose 3*w*h wraps mod 2^32 must
    // yield NULL, not an out-of-bounds copy
    assert(graft.functions.RgbOps.centerCrop(
      Array.emptyByteArray, 1073741824, 4) === null)
    assert(graft.functions.RgbOps.resize(
      Array.emptyByteArray, 1073741824, 4, 4, 4) === null)
  }

  test("center crop and nearest resize do exact integer index math") {
    // 4x2 plane, pixel value = 10*x + y in every channel
    val w = 4; val h = 2
    val b = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; (10 * (p % w) + p / w).toByte
    }
    val crop = RgbOps.centerCrop(b, w, h) // side 2, x0 = 1, y0 = 0
    assert(crop.length === 2 * 2 * 3)
    assert(crop.grouped(3).map(_(0).toInt).toSeq === Seq(10, 20, 11, 21))
    // resize 2x2 -> 4x4: floor mapping duplicates each source pixel
    val up = RgbOps.resize(crop, 2, 2, 4, 4)
    assert(up.grouped(3).map(_(0).toInt).toSeq ===
      Seq(10, 10, 20, 20, 10, 10, 20, 20, 11, 11, 21, 21, 11, 11, 21, 21))
    // dimension mismatch -> null (plane and dims must agree)
    assert(RgbOps.centerCrop(b, 3, 2) === null)
    assert(RgbOps.resize(b, 5, 2, 4, 4) === null)
  }

  test("stats: channel sums, count, luminance bins") {
    // two pixels: pure black and pure white
    val b = Array[Byte](0, 0, 0, -1, -1, -1)
    val st = RgbOps.stats(b).toLongArray()
    assert(st.toSeq === Seq(255L, 255L, 255L, 2L, 1L, 0L, 0L, 1L))
    assert(RgbOps.stats(Array[Byte](1, 2)) === null)
  }

  test("q_media_pixels: real pixels end-to-end, spot-checked against the formula") {
    val out = graft.queries.TrainingQueries.qMediaPixels(spark, sf).collect()
    assert(out.length === MediaCorpus.NumPixelPng)
    val i = 7
    val (w, h) = MediaCorpus.pixelDims(i)
    val row = out.find(_.getString(0) == f"px_$i%03d.png").get
    assert(row.getAs[Long]("width") === w.toLong)
    assert(row.getAs[Long]("height") === h.toLong)
    var sr = 0L
    for (y <- 0 until h; x <- 0 until w) sr += MediaCorpus.pixelR(i, x, y)
    assert(row.getAs[Long]("sum_r") === sr)
    assert(row.getAs[Long]("mean_r_ppm") === sr * 1000000L / (w * h))
    // resized sums replay the crop+resize index walk
    val side = math.min(w, h); val x0 = (w - side) / 2; val y0 = (h - side) / 2
    var rr = 0L
    for (oy <- 0 until 16; ox <- 0 until 16)
      rr += MediaCorpus.pixelR(i, x0 + ox * side / 16, y0 + oy * side / 16)
    assert(row.getAs[Long]("r16_sum_r") === rr)
    // histogram bins cover exactly the 256 resized pixels
    val bins = Seq("lum_b0", "lum_b1", "lum_b2", "lum_b3")
      .map(row.getAs[Long](_)).sum
    assert(bins === 256L)
  }

  test("decode stays inside whole-stage codegen (no UDF boundary)") {
    val dir = MediaCorpus.ensurePixels()
    val df = spark.read.format("binaryFile").load(dir)
      .select(graft.functions.MediaExprs.pngRgb(col("content")).as("rgb"))
      .select(length(col("rgb")).as("n"))
    // the '*(n)' prefix is the WholeStageCodegen marker in the
    // compact plan rendering; the expression must sit inside a
    // codegen stage, not behind a UDF/Python boundary
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [length(png_rgb(")
      || plan.contains("WholeStageCodegen"), plan)
    assert(!plan.contains("BatchEvalPython"))
    val n = df.agg(sum(col("n"))).collect().head.getLong(0)
    val want = (0 until MediaCorpus.NumPixelPng).map { i =>
      val (w, h) = MediaCorpus.pixelDims(i); w.toLong * h * 3
    }.sum
    assert(n === want)
  }

  test("int-typed dims columns coerce at analysis time (no runtime cast crash)") {
    // regression (r12 ADVICE #1): crop/resize declared no input types,
    // so an IntegerType dims column hit asInstanceOf[Long] at runtime
    val (w, h) = MediaCorpus.pixelDims(2)
    val rgb = PngRgb.decode(MediaCorpus.pngPixelBytes(2))
    val df = Seq((rgb, w, h)).toDF("rgb", "w", "h") // w, h are INTs
    val out = df.select(
        graft.functions.RgbExprs.rgbCenterCrop(col("rgb"), col("w"), col("h"))
          .as("crop"),
        graft.functions.RgbExprs.rgbResize(col("rgb"), col("w"), col("h"),
          4, 4).as("r4"),
        graft.functions.RgbExprs.dibRgb(col("rgb"), col("w"), col("h"))
          .as("bad"))
      .select(length(col("crop")), length(col("r4")), col("bad"))
      .collect().head
    val side = math.min(w, h)
    assert(out.getInt(0) === side * side * 3)
    assert(out.getInt(1) === 4 * 4 * 3)
    assert(out.isNullAt(2)) // PNG plane is not a DIB layout -> NULL, no throw
  }

  test("dibToRgb: bottom-up padded BGR converts to the writer's exact RGB plane") {
    val i = 1; val f = 0
    val (w, h) = MediaCorpus.dibDims(i)
    assert(MediaCorpus.dibStride(w) > 3 * w, "fixture must exercise row padding")
    val rgb = RgbOps.dibToRgb(MediaCorpus.dibFrameBytes(i, f), w, h)
    assert(rgb != null && rgb.length === w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val sy = h - 1 - y // converted row y reads storage row h-1-y
      assert((rgb(o) & 0xff) === MediaCorpus.dibPix(i, f, x, sy, 2), s"R($x,$y)")
      assert((rgb(o + 1) & 0xff) === MediaCorpus.dibPix(i, f, x, sy, 1), s"G($x,$y)")
      assert((rgb(o + 2) & 0xff) === MediaCorpus.dibPix(i, f, x, sy, 0), s"B($x,$y)")
    }
    // wrong-length buffers (no padding / truncated) degrade to null
    assert(RgbOps.dibToRgb(new Array[Byte](3 * w * h), w, h) === null)
    assert(RgbOps.dibToRgb(MediaCorpus.dibFrameBytes(i, f).drop(1), w, h) === null)
    assert(RgbOps.dibToRgb(MediaCorpus.dibFrameBytes(i, f), -w, h) === null)
  }
}

/** Test-side PNG encoder: real Deflater IDAT with per-row filter
  * types encoded per RFC 2083 — lets specs and property suites prove
  * the decoder on generic zlib streams and all five filters, not
  * just the corpus's stored/filter-0 shape. */
object PngTestVectors {

  def filteredPng(w: Int, h: Int, pixels: Array[Byte],
      filters: Seq[Int], nIdat: Int = 2): Array[Byte] = {
    require(filters.length == h && pixels.length == w * h * 3)
    val bpp = 3
    val rowLen = 3 * w
    val raw = new Array[Byte](h * (1 + rowLen))
    for (y <- 0 until h) {
      val ft = filters(y)
      raw(y * (1 + rowLen)) = ft.toByte
      for (i <- 0 until rowLen) {
        val cur = pixels(y * rowLen + i) & 0xff
        val left = if (i >= bpp) pixels(y * rowLen + i - bpp) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * rowLen + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) pixels((y - 1) * rowLen + i - bpp) & 0xff else 0
        val enc = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left
              else if (pb <= pc) up else ul
            cur - pred
        }
        raw(y * (1 + rowLen) + 1 + i) = enc.toByte
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, payload: Array[Byte]): Unit = {
      d.writeInt(payload.length)
      val body = typ.getBytes("US-ASCII") ++ payload
      d.write(body)
      val crc = new java.util.zip.CRC32(); crc.update(body)
      d.writeInt(crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    val hd = new java.io.DataOutputStream(ihdr)
    hd.writeInt(w); hd.writeInt(h)
    hd.write(8); hd.write(2); hd.write(0); hd.write(0); hd.write(0)
    chunk("IHDR", ihdr.toByteArray)
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = defl.deflate(buf); defl.end()
    // split the stream across several IDAT chunks: decoders must
    // concatenate payloads before inflating (RFC 2083 §4.1.3)
    val cuts = (0 to nIdat).map(j => j * n / nIdat)
    cuts.sliding(2).foreach { case Seq(a, b) =>
      chunk("IDAT", buf.slice(a, b))
    }
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
