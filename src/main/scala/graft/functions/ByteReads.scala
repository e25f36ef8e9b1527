package graft.functions

/** Shared primitive byte readers for the native container parsers
  * (PNG/JPEG big-endian, RIFF WAV/AVI little-endian). One definition
  * per shape: the hostile-size overflow class was fixed three times
  * in separate private copies before this object existed — shared
  * readers keep the next such fix a single edit. */
private[functions] object ByteReads {

  def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  def be32(b: Array[Byte], i: Int): Int =
    (be16(b, i) << 16) | be16(b, i + 2)

  def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  def le32(b: Array[Byte], i: Int): Int = le16(b, i) | (le16(b, i + 2) << 16)

  /** The 4 ASCII bytes at `off` equal `t`. */
  def fourccIs(b: Array[Byte], off: Int, t: String): Boolean =
    u8(b, off) == t.charAt(0) && u8(b, off + 1) == t.charAt(1) &&
      u8(b, off + 2) == t.charAt(2) && u8(b, off + 3) == t.charAt(3)

  /** True when chunk payload `[pos+hdr, pos+hdr+size)` fits inside
    * the buffer — in LONG arithmetic, so a hostile ~2^31 size field
    * can neither wrap the bound nor (after this guard) overflow the
    * caller's position advance. */
  def fits(b: Array[Byte], pos: Int, hdr: Int, size: Int): Boolean =
    size >= 0 && pos.toLong + hdr + size <= b.length.toLong
}
