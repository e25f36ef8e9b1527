package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Deterministic on-disk tar-shard corpus in the WebDataset sample
  * layout — the de-facto container for large multimodal training
  * corpora: a directory of `.tar` shards, each holding samples whose
  * members share a basename prefix (`sample_0042.png` +
  * `sample_0042.txt` = one image-text pair). Training jobs stream
  * whole shards sequentially instead of issuing one object-store GET
  * per tiny file — at 100 TB the shard IS the unit of IO, so the
  * engine must parse members out of shard bytes itself.
  *
  * The container is POSIX ustar (IEEE 1003.1 `pax` §ustar header
  * block): 512-byte headers — name[100], zero-padded octal size at
  * offset 124[12], checksum at 148[8] (simple byte sum with the
  * checksum field read as spaces), typeflag at 156, magic "ustar" at
  * 257 — each followed by the member bytes padded to the next
  * 512-byte boundary, terminated by two zero blocks. A public format,
  * writable and parseable with no library.
  *
  * Image members reuse [[MediaCorpus]]'s real header bytes (PNG
  * RFC 2083 / JPEG T.81), so the per-member dimension parse is the
  * same code path as the flat-directory corpus; caption members are
  * deterministic ASCII of per-sample varying length. Everything is a
  * pure function of (shard, sample) — the DuckDB oracle re-derives
  * every output value from the shard bytes alone.
  */
object TarShards {

  val DefaultDir = "/tmp/graft_tar"
  val NumShards = 6
  val SamplesPerShard = 16

  /** Global sample index: shards carry disjoint contiguous ranges. */
  def sampleId(shard: Int, i: Int): Int = shard * SamplesPerShard + i

  /** Even samples are PNG, odd are JPEG (dims from the same
    * deterministic schedules as the flat corpus). */
  def isPng(id: Int): Boolean = id % 2 == 0

  def dims(id: Int): (Int, Int) =
    if (isPng(id)) MediaCorpus.pngDims(id % 24) else MediaCorpus.jpegDims(id % 24)

  def caption(id: Int): String = {
    val words = Seq("amber", "basalt", "cirrus", "delta", "ember",
      "fjord", "garnet", "harbor")
    val n = 3 + id % 6
    (0 until n).map(j => words((id + j * 5) % words.length))
      .mkString(s"sample $id: ", " ", "")
  }

  def imageName(id: Int): String =
    f"sample_$id%04d.${if (isPng(id)) "png" else "jpg"}"
  def captionName(id: Int): String = f"sample_$id%04d.txt"

  def imageBytes(id: Int): Array[Byte] = {
    val (w, h) = dims(id)
    if (isPng(id)) MediaCorpus.pngBytes(w, h)
    else MediaCorpus.jpegBytes(w, h, MediaCorpus.jpegComLen(id % 24))
  }

  /** One ustar header block. Octal fields are zero-padded with a
    * trailing NUL (the GNU/pax-compatible rendering); the checksum is
    * the byte sum of the block with its own field as eight spaces,
    * rendered as six octal digits + NUL + space (ustar §header
    * chksum). */
  def headerBlock(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("US-ASCII").length <= 100, s"name too long: $name")
    val b = new Array[Byte](512)
    val nb = name.getBytes("US-ASCII")
    System.arraycopy(nb, 0, b, 0, nb.length)
    def oct(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val digits = len - 1
      require(s.length <= digits, s"octal overflow: $v in $len")
      val p = ("0" * (digits - s.length)) + s
      System.arraycopy(p.getBytes("US-ASCII"), 0, b, off, digits)
      b(off + digits) = 0
    }
    oct(0x1a4, 100, 8)            // mode 0644
    oct(0, 108, 8); oct(0, 116, 8) // uid, gid
    oct(size, 124, 12)
    oct(0, 136, 12)               // mtime: epoch, deterministic bytes
    b(156) = '0'                  // typeflag: regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, b, 257, 5)
    b(262) = 0; b(263) = '0'; b(264) = '0'
    java.util.Arrays.fill(b, 148, 156, ' '.toByte)
    val sum = b.map(_ & 0xff).sum
    val cs = java.lang.Long.toOctalString(sum.toLong)
    val csp = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csp.getBytes("US-ASCII"), 0, b, 148, 6)
    b(154) = 0; b(155) = ' '
    b
  }

  private def pad512(n: Int): Int = (512 - n % 512) % 512

  /** The full byte content of one shard. */
  def shardBytes(shard: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    (0 until SamplesPerShard).foreach { i =>
      val id = sampleId(shard, i)
      Seq(imageName(id) -> imageBytes(id),
          captionName(id) -> caption(id).getBytes("US-ASCII"))
        .foreach { case (name, bytes) =>
          out.write(headerBlock(name, bytes.length.toLong))
          out.write(bytes)
          out.write(new Array[Byte](pad512(bytes.length)))
        }
    }
    out.write(new Array[Byte](1024)) // end-of-archive: two zero blocks
    out.toByteArray
  }

  /** Idempotently materialize the shard directory (same atomic-move
    * contract as [[MediaCorpus.ensure]]). */
  def ensure(dir: String = DefaultDir): String = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    (0 until NumShards).foreach { s =>
      val bytes = shardBytes(s)
      val target = root.resolve(f"shard_$s%02d.tar")
      if (!(Files.exists(target) && Files.size(target) == bytes.length)) {
        val tmp = Files.createTempFile(root, s".shard_$s.", ".tmp")
        Files.write(tmp, bytes)
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
        }
      }
    }
    dir
  }
}
