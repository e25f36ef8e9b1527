package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.CRC32

/** Deterministic on-disk media corpus: well-formed PNG and JPEG
  * headers whose dimensions are a fixed function of the file index —
  * the real-bytes twin of the md5-stub decoder in
  * [[graft.ops.Multimodal]]. Both container formats are public
  * specifications (PNG: RFC 2083 / ISO 15948 — 8-byte signature then
  * length-tagged CRC'd chunks, IHDR first; JPEG/JFIF: ITU T.81 —
  * 0xFF-marker segments, frame dimensions in the SOF segment), so
  * header-level dimension parsing needs no codec dependency and the
  * DuckDB oracle can re-derive every value from the same bytes
  * (`read_blob` + hex arithmetic).
  *
  * The JPEG files carry a COM (comment) segment of per-file VARYING
  * length before SOF0, so the SOF offset differs file to file — a
  * fixed-offset "parser" cannot pass the oracle; only a real segment
  * walk does. Pixel data is intentionally absent (a zero-entropy
  * IDAT / no scan data): the engine treats media as opaque bytes and
  * decodes nothing but the header, exactly the metadata pass a
  * 100 TB ingest runs before any pixel work is scheduled.
  */
object MediaCorpus {

  val DefaultDir = "/tmp/graft_media"
  val NumPng = 24
  val NumJpeg = 24

  /** Pixel corpus: REAL-pixel PNGs (8-bit truecolor, stored-deflate
    * IDAT) for the decode path — separate dir so the header-only
    * corpus above keeps its byte lengths. */
  val PixelDir = "/tmp/graft_media_px"
  val NumPixelPng = 20

  /** Audio corpus: REAL-sample RIFF/WAV files (PCM s16le, varying
    * rate/channel layout, a varying-length LIST chunk before `data`
    * so the data offset moves per file). */
  val WavDir = "/tmp/graft_media_wav"
  val NumWav = 16

  /** Video corpus: REAL RIFF/AVI containers (MJPG — each frame is a
    * complete JPEG from [[jpegBytes]] with per-frame-varying COM
    * padding, so frame sizes differ and offset arithmetic is real;
    * a varying JUNK chunk moves the movi list per file). */
  val AviDir = "/tmp/graft_media_avi"
  val NumAvi = 12

  /** Deterministic dimension schedules (mix of fits-in-336 and
    * needs-resize on both axes). */
  def pngDims(i: Int): (Int, Int) = (64 + 31 * i, 48 + 17 * i)
  def jpegDims(i: Int): (Int, Int) = (400 + 13 * i, 240 + 29 * i)
  /** COM padding varies the SOF byte offset per file. */
  def jpegComLen(i: Int): Int = 2 + (i * 7) % 40

  /** Idempotently materialize the corpus; returns the directory.
    * Concurrency-safe: each file is written to a temp name and
    * atomically moved, and an existing file of the expected length is
    * left alone (bytes are a pure function of the name). */
  def ensure(dir: String = DefaultDir): String = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    (0 until NumPng).foreach { i =>
      val (w, h) = pngDims(i)
      put(root, f"img_$i%03d.png", pngBytes(w, h))
    }
    (0 until NumJpeg).foreach { i =>
      val (w, h) = jpegDims(i)
      put(root, f"img_$i%03d.jpg", jpegBytes(w, h, jpegComLen(i)))
    }
    dir
  }

  private def put(root: Path, name: String, bytes: Array[Byte]): Unit = {
    val target = root.resolve(name)
    if (Files.exists(target) && Files.size(target) == bytes.length) return
    val tmp = Files.createTempFile(root, s".$name.", ".tmp")
    Files.write(tmp, bytes)
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp) // concurrent writer won the race
    }
  }

  /** Minimal well-formed PNG: signature, IHDR (13-byte payload:
    * width, height, bit depth 8, color type 2 = truecolor, default
    * compression/filter/interlace), IEND. CRCs are real (CRC32 over
    * type+payload), so any spec-conformant reader accepts the
    * header. */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"png dims must be positive: ${w}x$h")
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, payload: Array[Byte]): Unit = {
      d.writeInt(payload.length)
      val body = typ.getBytes("US-ASCII") ++ payload
      d.write(body)
      val crc = new CRC32(); crc.update(body)
      d.writeInt(crc.getValue.toInt)
    }
    val ihdr = new ByteArrayOutputStream()
    val hd = new DataOutputStream(ihdr)
    hd.writeInt(w); hd.writeInt(h)
    hd.write(8); hd.write(2); hd.write(0); hd.write(0); hd.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Pixel-corpus dimension schedule: 8x6 up to 65x44 — small enough
    * that one stored-deflate block (<64 KiB) holds every scanline,
    * large enough that center-crop and 16x16 resize both do real
    * index arithmetic. */
  def pixelDims(i: Int): (Int, Int) = (8 + 3 * i, 6 + 2 * i)

  /** Deterministic per-pixel channel values — an integer function of
    * (file, x, y) either engine can recompute. */
  def pixelR(i: Int, x: Int, y: Int): Int = (i * 31 + x * 7 + y * 13) % 256
  def pixelG(i: Int, x: Int, y: Int): Int = (i * 17 + x * 11 + y * 3) % 256
  def pixelB(i: Int, x: Int, y: Int): Int = (i * 29 + x * 5 + y * 19) % 256

  /** tEXt payload length varies per file, so the IDAT offset differs
    * file to file — a fixed-offset pixel "decoder" cannot pass the
    * oracle; only a real chunk walk finds the scanlines. */
  def pixelTextLen(i: Int): Int = (i * 5) % 37

  /** Idempotently materialize the pixel corpus. */
  def ensurePixels(dir: String = PixelDir): String = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    (0 until NumPixelPng).foreach { i =>
      put(root, f"px_$i%03d.png", pngPixelBytes(i))
    }
    dir
  }

  /** Real-pixel PNG `i`: signature, IHDR (8-bit truecolor), a tEXt
    * chunk of per-file-varying length (moves the IDAT offset), ONE
    * IDAT whose zlib stream is a single STORED deflate block
    * (btype=00 — the raw scanlines sit verbatim in the file, so the
    * DuckDB oracle reads pixels by offset arithmetic while the JVM
    * side inflates them generically), IEND. Scanlines use filter 0;
    * adler32 and chunk CRCs are real, so any conformant decoder
    * accepts the file. */
  def pngPixelBytes(i: Int): Array[Byte] = {
    val (w, h) = pixelDims(i)
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, payload: Array[Byte]): Unit = {
      d.writeInt(payload.length)
      val body = typ.getBytes("US-ASCII") ++ payload
      d.write(body)
      val crc = new CRC32(); crc.update(body)
      d.writeInt(crc.getValue.toInt)
    }
    val ihdr = new ByteArrayOutputStream()
    val hd = new DataOutputStream(ihdr)
    hd.writeInt(w); hd.writeInt(h)
    hd.write(8); hd.write(2); hd.write(0); hd.write(0); hd.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("tEXt", ("Comment\u0000" + "x" * pixelTextLen(i)).getBytes("US-ASCII"))
    // scanlines: filter byte 0 + RGB triplets
    val raw = new Array[Byte](h * (1 + 3 * w))
    var p = 0
    var y = 0
    while (y < h) {
      raw(p) = 0; p += 1
      var x = 0
      while (x < w) {
        raw(p) = pixelR(i, x, y).toByte
        raw(p + 1) = pixelG(i, x, y).toByte
        raw(p + 2) = pixelB(i, x, y).toByte
        p += 3; x += 1
      }
      y += 1
    }
    require(raw.length <= 0xffff, s"stored block too large: ${raw.length}")
    val idat = new ByteArrayOutputStream()
    val id = new DataOutputStream(idat)
    id.write(0x78); id.write(0x01)            // zlib CMF/FLG (31-check ok)
    id.write(0x01)                             // bfinal=1, btype=00 (stored)
    id.write(raw.length & 0xff); id.write((raw.length >> 8) & 0xff)
    id.write(~raw.length & 0xff); id.write((~raw.length >> 8) & 0xff)
    id.write(raw)
    val adler = new java.util.zip.Adler32(); adler.update(raw)
    id.writeInt(adler.getValue.toInt)
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Audio schedule: rate cycles the common speech/music rates,
    * mono/stereo alternates, length varies so duration and framing
    * arithmetic get distinct answers per file. */
  def wavRate(i: Int): Int = Seq(8000, 16000, 22050, 44100)(i % 4)
  def wavChannels(i: Int): Int = 1 + (i % 2)
  def wavSamples(i: Int): Int = 1500 + 317 * i

  /** Deterministic PCM sample (per file, frame index, channel) — an
    * integer function either engine can recompute. Spans the full
    * s16 range so clipping detection has real signal. */
  def wavSample(i: Int, t: Int, c: Int): Int =
    ((i * 31 + t * 7919 + c * 104729) % 65536) - 32768

  /** LIST/INFO payload length varies per file, so the `data` chunk
    * offset moves — a fixed-offset "parser" cannot pass the oracle;
    * only a real RIFF chunk walk finds the samples. Always EVEN: RIFF
    * pads odd chunks with an uncounted byte, a wrinkle kept out of
    * the deterministic corpus (the parser still handles it). */
  def wavListLen(i: Int): Int = 4 + 2 * ((i * 5) % 20)

  /** Idempotently materialize the audio corpus. */
  def ensureWavs(dir: String = WavDir): String = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    (0 until NumWav).foreach { i =>
      put(root, f"au_$i%03d.wav", wavBytes(i))
    }
    dir
  }

  /** Real RIFF/WAVE file `i`: canonical PCM fmt chunk (16-byte,
    * format 1, s16le), a LIST(INFO) chunk of per-file-varying length,
    * then interleaved PCM frames in `data`. Little-endian throughout
    * per the RIFF spec — the byte-order twin of the big-endian PNG
    * path, so the cross-engine byte arithmetic is exercised both
    * ways. */
  def wavBytes(i: Int): Array[Byte] = {
    val rate = wavRate(i); val ch = wavChannels(i); val n = wavSamples(i)
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val listPayload = ("INFO" + "c" * (wavListLen(i) - 4)).getBytes("US-ASCII")
    val dataLen = n * ch * 2
    val riffLen = 4 + (8 + 16) + (8 + listPayload.length) + (8 + dataLen)
    fourcc("RIFF"); u32(riffLen); fourcc("WAVE")
    fourcc("fmt "); u32(16)
    u16(1); u16(ch); u32(rate)
    u32(rate * ch * 2); u16(ch * 2); u16(16)
    fourcc("LIST"); u32(listPayload.length); out.write(listPayload)
    fourcc("data"); u32(dataLen)
    var t = 0
    while (t < n) {
      var c = 0
      while (c < ch) { u16(wavSample(i, t, c) & 0xffff); c += 1 }
      t += 1
    }
    out.toByteArray
  }

  /** Video schedule: per-file dims, frame rate (scale fixed at 1)
    * and frame count; per-frame COM padding varies frame byte sizes
    * inside one file. */
  def aviDims(i: Int): (Int, Int) = (160 + 16 * i, 120 + 8 * i)
  def aviFps(i: Int): Int = 12 + (i % 12)
  def aviFrameCount(i: Int): Int = 3 + (i % 4)
  def aviFrameComLen(i: Int, f: Int): Int = 2 + ((i * 7 + f * 11) % 40)
  /** JUNK payload varies the movi offset per file (even, see WAV). */
  def aviJunkLen(i: Int): Int = 4 + 2 * ((i * 3) % 17)

  /** The exact JPEG bytes of frame `f` of file `i`. */
  def aviFrameBytes(i: Int, f: Int): Array[Byte] = {
    val (w, h) = aviDims(i)
    jpegBytes(w, h, aviFrameComLen(i, f))
  }

  /** Idempotently materialize the video corpus. */
  def ensureAvis(dir: String = AviDir): String = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    (0 until NumAvi).foreach { i =>
      put(root, f"vid_$i%03d.avi", aviBytes(i))
    }
    dir
  }

  /** Real RIFF/AVI `i` (OpenDML-free classic layout): LIST hdrl with
    * a 56-byte `avih` (frame timing, count, dims) and one `vids`
    * stream (`strh` MJPG + `strf` BITMAPINFOHEADER), a JUNK chunk of
    * per-file-varying length, LIST movi holding one `00dc` chunk per
    * frame (a complete JPEG; odd sizes padded per RIFF), and a
    * standard `idx1` (one 16-byte entry per frame, offsets relative
    * to the `movi` fourcc). Little-endian throughout. */
  def aviBytes(i: Int): Array[Byte] = {
    val (w, h) = aviDims(i)
    aviContainer(w, h, aviFps(i), aviJunkLen(i),
      (0 until aviFrameCount(i)).map(f => aviFrameBytes(i, f)),
      chunkId = "00dc", handler = "MJPG", dibCompression = false)
  }

  /** Shared RIFF/AVI writer for the MJPG ([[aviBytes]]) and
    * uncompressed-DIB ([[aviDibBytes]]) corpora — identical layout,
    * differing only in the frame chunk id (00dc/00db), the stream
    * handler fourcc, and strf biCompression (fourcc vs BI_RGB 0). */
  private def aviContainer(w: Int, h: Int, fps: Int, junk: Int,
      frames: Seq[Array[Byte]], chunkId: String, handler: String,
      dibCompression: Boolean): Array[Byte] = {
    val nFrames = frames.length
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def pad(n: Int): Int = n & 1

    val moviPayload = 4 + frames.map(fr => 8 + fr.length + pad(fr.length)).sum
    val idx1Payload = 16 * nFrames
    val hdrlPayload = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffPayload = 4 + (8 + hdrlPayload) + (8 + junk) +
      (8 + moviPayload) + (8 + idx1Payload)

    fourcc("RIFF"); u32(riffPayload); fourcc("AVI ")
    fourcc("LIST"); u32(hdrlPayload); fourcc("hdrl")
    fourcc("avih"); u32(56)
    u32(1000000 / fps)            // dwMicroSecPerFrame
    u32(0); u32(0)                // maxBytesPerSec, padding
    u32(0x10)                     // AVIF_HASINDEX
    u32(nFrames); u32(0); u32(1); u32(0)
    u32(w); u32(h)
    u32(0); u32(0); u32(0); u32(0)
    fourcc("LIST"); u32(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); u32(56)
    fourcc("vids"); fourcc(handler)
    u32(0); u16(0); u16(0); u32(0)
    u32(1); u32(fps)              // dwScale, dwRate: fps = rate/scale
    u32(0); u32(nFrames)          // start, length (frames)
    u32(0); u32(0); u32(0)        // bufSize, quality, sampleSize
    u16(0); u16(0); u16(w); u16(h) // rcFrame
    fourcc("strf"); u32(40)
    u32(40); u32(w); u32(h)
    u16(1); u16(24)
    if (dibCompression) u32(0)    // biCompression = BI_RGB
    else fourcc(handler)
    u32(w * h * 3); u32(0); u32(0); u32(0); u32(0)
    fourcc("JUNK"); u32(junk)
    (0 until junk).foreach(j => out.write('j' + j % 16))
    val moviFourccPos = out.size + 8 // offset of the 'movi' fourcc
    fourcc("LIST"); u32(moviPayload); fourcc("movi")
    val frameOffsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    frames.foreach { fr =>
      frameOffsets += out.size - moviFourccPos // rel. to 'movi' fourcc
      fourcc(chunkId); u32(fr.length); out.write(fr)
      if (pad(fr.length) == 1) out.write(0)
    }
    fourcc("idx1"); u32(idx1Payload)
    frames.zip(frameOffsets).foreach { case (fr, off) =>
      fourcc(chunkId); u32(0x10); u32(off); u32(fr.length)
    }
    out.toByteArray
  }

  /** Uncompressed-DIB video corpus: raw BOTTOM-UP BGR frames (`00db`
    * chunks, positive biHeight, rows padded to 4-byte boundaries —
    * the classic BITMAPINFOHEADER layout), so [[graft.functions
    * .RgbExprs]] can run on REAL video-frame pixels with a byte-exact
    * oracle (no codec between the container and the pixels). Widths
    * alternate between zero and nonzero row padding. */
  val DibDir = "/tmp/graft_media_dib"
  val NumDib = 6
  def dibDims(i: Int): (Int, Int) = (24 + 2 * i, 16 + 2 * i)
  def dibFps(i: Int): Int = 10 + (i % 8)
  def dibFrameCount(i: Int): Int = 2 + (i % 3)
  def dibJunkLen(i: Int): Int = 4 + 2 * ((i * 5) % 13)
  /** DIB row stride: pixel rows pad to 4-byte boundaries. */
  def dibStride(w: Int): Int = (3 * w + 3) / 4 * 4
  /** Deterministic BGR byte at storage position (x, y bottom-up, c
    * in B=0,G=1,R=2). */
  def dibPix(i: Int, f: Int, x: Int, y: Int, c: Int): Int =
    (i * 37 + f * 11 + x * 7 + y * 13 + c * 29) % 256

  def dibFrameBytes(i: Int, f: Int): Array[Byte] = {
    val (w, h) = dibDims(i)
    val stride = dibStride(w)
    val a = new Array[Byte](stride * h) // padding bytes stay zero
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          a(y * stride + 3 * x + c) = dibPix(i, f, x, y, c).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    a
  }

  def aviDibBytes(i: Int): Array[Byte] = {
    val (w, h) = dibDims(i)
    aviContainer(w, h, dibFps(i), dibJunkLen(i),
      (0 until dibFrameCount(i)).map(f => dibFrameBytes(i, f)),
      chunkId = "00db", handler = "DIB ", dibCompression = true)
  }

  /** Idempotently materialize the DIB video corpus. */
  def ensureDibAvis(dir: String = DibDir): String = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    (0 until NumDib).foreach { i =>
      put(root, f"dib_$i%03d.avi", aviDibBytes(i))
    }
    dir
  }

  /** Minimal well-formed JPEG/JFIF header stream: SOI, APP0 (JFIF
    * 1.1), COM of `comLen` payload bytes (varies the SOF offset),
    * SOF0 (baseline, 8-bit, 1 component, height THEN width per
    * T.81 B.2.2), EOI. No scan data — header-only by design. */
  def jpegBytes(w: Int, h: Int, comLen: Int): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff,
      s"jpeg dims must fit u16: ${w}x$h")
    require(comLen >= 0 && comLen <= 0xffff - 2, s"bad comLen $comLen")
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.write(0xff); d.write(0xd8) // SOI
    // APP0: JFIF 1.1, no-unit density 1x1, no thumbnail
    d.write(0xff); d.write(0xe0); d.writeShort(16)
    d.write("JFIF".getBytes("US-ASCII")); d.write(0)
    d.write(1); d.write(1); d.write(0)
    d.writeShort(1); d.writeShort(1); d.write(0); d.write(0)
    // COM: deterministic filler, length varies per file
    d.write(0xff); d.write(0xfe); d.writeShort(2 + comLen)
    (0 until comLen).foreach(j => d.write('a' + j % 26))
    // SOF0: precision 8, lines (height), samples/line (width), 1
    // component (id 1, 1x1 sampling, quant table 0)
    d.write(0xff); d.write(0xc0); d.writeShort(11)
    d.write(8); d.writeShort(h); d.writeShort(w)
    d.write(1); d.write(1); d.write(0x11); d.write(0)
    d.write(0xff); d.write(0xd9) // EOI
    out.toByteArray
  }
}
