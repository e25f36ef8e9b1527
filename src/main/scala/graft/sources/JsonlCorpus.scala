package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.GZIPOutputStream

/** Deterministic gzipped-JSONL shard corpus — the layout web-scale
  * text corpora actually ship in (one JSON document per line, shards
  * gzip-compressed, a directory of mid-size shards). gzip is NOT
  * splittable, so at 100 TB the parallelism unit is the SHARD: one
  * task decompresses one file end to end, and throughput scales with
  * shard count, not shard size — exactly why the ecosystem ships
  * many ~100 MB–1 GB shards instead of few huge ones. The reader side
  * must therefore (a) take an explicit schema (no inference pass over
  * compressed bytes) and (b) treat per-file decompression as the
  * scan's unit of work. Lines carry a NESTED `meta` object so the
  * ingest exercises nested-schema extraction, and a deliberately
  * malformed line per shard exercises PERMISSIVE corrupt-record
  * routing (a poison line must cost one row, not the shard).
  */
object JsonlCorpus {

  val DefaultDir = "/tmp/graft_jsonl"
  val NumShards = 4
  val DocsPerShard = 250

  private val words = Vector("alder", "birch", "cedar", "dogwood",
    "elm", "fir", "ginkgo", "hazel", "juniper", "katsura")
  private val sources = Vector("web", "books", "code")
  private val langs = Vector("en", "de", "fr")

  def docId(shard: Int, i: Int): Long = (shard * DocsPerShard + i).toLong

  def source(id: Long): String = sources((id % 3).toInt)
  def lang(id: Long): String = langs((id % 5 % 3).toInt)
  def stars(id: Long): Long = id % 7

  def text(id: Long): String = {
    val n = 4 + (id % 9).toInt
    (0 until n).map(j => words(((id + j * 3) % words.length).toInt))
      .mkString(" ")
  }

  /** One shard's uncompressed lines; line `DocsPerShard / 2` is
    * deliberately malformed (truncated JSON). */
  def shardLines(shard: Int): Seq[String] =
    (0 until DocsPerShard).map { i =>
      if (i == DocsPerShard / 2) """{"doc_id": 999, "source": "truncat"""
      else {
        val id = docId(shard, i)
        s"""{"doc_id": $id, "source": "${source(id)}", """ +
          s""""meta": {"lang": "${lang(id)}", "stars": ${stars(id)}}, """ +
          s""""text": "${text(id)}"}"""
      }
    }

  def ensure(dir: String = DefaultDir): String = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    (0 until NumShards).foreach { s =>
      val bytes = {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bos)
        gz.write(shardLines(s).mkString("", "\n", "\n").getBytes("UTF-8"))
        gz.close()
        bos.toByteArray
      }
      val target = root.resolve(f"shard_$s%02d.jsonl.gz")
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
