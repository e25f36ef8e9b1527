package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{Bridge, ExpectsBinaryInput}
import org.apache.spark.sql.types.{DataType, LongType}

/** Header-level image dimension parsing as a native codegen'd
  * expression over an opaque `binary` media column — the metadata
  * pass a training-data ingest runs over every blob BEFORE any pixel
  * work is scheduled (filter by size/aspect, plan resizes, route to
  * decoders). Both formats are parsed from their public container
  * structure (PNG IHDR per RFC 2083 §4.1.1; JPEG SOF per ITU T.81
  * B.2.2 via a real marker-segment walk), no codec dependency.
  * Malformed or unrecognized bytes yield NULL, not an exception —
  * at corpus scale a poison blob must not kill the scan stage.
  */
object MediaExprs {

  /** Packed `(width << 32) | height` of a PNG or JPEG blob; NULL for
    * anything else. Packing keeps the expression a primitive long —
    * stays inside whole-stage codegen; unpack with `shiftright` /
    * `& 0xffffffff`. */
  def imageDims(c: Column): Column =
    Bridge.column(ImagePackedDims(Bridge.expression(c)))

  def width(packed: Column): Column =
    org.apache.spark.sql.functions.shiftright(packed, 32)

  def height(packed: Column): Column =
    packed.bitwiseAND(org.apache.spark.sql.functions.lit(0xffffffffL))
}

case class ImagePackedDims(child: Expression)
    extends UnaryExpression with ExpectsBinaryInput {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_packed_dims"

  override def nullSafeEval(input: Any): Any = {
    val p = ImagePackedDims.packed(input.asInstanceOf[Array[Byte]])
    if (p < 0L) null else java.lang.Long.valueOf(p)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImagePackedDims.packed($c);
      if (${ev.value} < 0L) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImagePackedDims {

  /** `(width << 32) | height`, or -1 if the bytes are not a
    * recognizable PNG or JPEG header. Shared by the interpreted and
    * generated paths. */
  def packed(b: Array[Byte]): Long = {
    val png = pngDims(b)
    if (png >= 0L) png else jpegDims(b)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (be16(b, i).toLong << 16) | be16(b, i + 2).toLong

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first
    * (RFC 2083 §3), so width/height sit at fixed offsets 16/20. */
  private def pngDims(b: Array[Byte]): Long = {
    if (b.length < 24) return -1L
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if (u8(b, i) != sig(i)) return -1L; i += 1 }
    if (!(u8(b, 12) == 'I' && u8(b, 13) == 'H' && u8(b, 14) == 'D' &&
        u8(b, 15) == 'R')) return -1L
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0L || h <= 0L) -1L else (w << 32) | h
  }

  /** JPEG: SOI then a marker-segment walk to the first SOF marker
    * (0xC0-0xCF minus DHT 0xC4, JPG 0xC8, DAC 0xCC); frame header
    * carries lines (height) then samples-per-line (width), T.81
    * B.2.2. Markers may be padded with runs of 0xFF fill bytes
    * (B.1.1.2) — skip them before classifying; TEM (0x01) and RSTn
    * (0xD0-0xD7) are standalone markers with no length field. Stops
    * cleanly at EOI, scan data, or truncation. */
  private def jpegDims(b: Array[Byte]): Long = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return -1L
    var p = 2
    while (p + 2 <= b.length) {
      if (u8(b, p) != 0xff) return -1L
      // consume 0xFF fill bytes: the marker code is the first non-FF
      while (p + 1 < b.length && u8(b, p + 1) == 0xff) p += 1
      if (p + 2 > b.length) return -1L
      val m = u8(b, p + 1)
      if (m == 0xd9 || m == 0xda) return -1L // EOI / SOS before any SOF
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        p += 2 // standalone marker, no length field
      } else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        if (p + 9 > b.length) return -1L
        val h = be16(b, p + 5).toLong
        val w = be16(b, p + 7).toLong
        return if (w <= 0L || h <= 0L) -1L else (w << 32) | h
      } else {
        if (p + 4 > b.length) return -1L
        val segLen = be16(b, p + 2)
        if (segLen < 2) return -1L
        p += 2 + segLen
      }
    }
    -1L
  }
}
