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
