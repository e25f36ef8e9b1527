package graft

import org.apache.spark.sql.functions._
import graft.sources.TarShards
import graft.functions.{TarEntries, TarExprs}

/** Tar-shard ingest (sources/TarShards + functions/TarExprs):
  * writer/parser round-trip, interop with the system tar, poison
  * robustness, and the end-to-end binaryFile slice. */
class TarSpec extends SparkSpec {

  private def parse(b: Array[Byte]): Option[Seq[(String, Long, Long)]] =
    Option(TarEntries.entries(b)).map(_.array.toSeq.map { r =>
      val row = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      (row.getUTF8String(0).toString, row.getLong(1), row.getLong(2))
    })

  test("writer/parser round-trip: every member at its exact bytes") {
    val bytes = TarShards.shardBytes(0)
    val es = parse(bytes).get
    assert(es.length === TarShards.SamplesPerShard * 2)
    es.zipWithIndex.foreach { case ((name, off, size), k) =>
      val id = TarShards.sampleId(0, k / 2)
      val expected =
        if (k % 2 == 0) TarShards.imageName(id) -> TarShards.imageBytes(id)
        else TarShards.captionName(id) ->
          TarShards.caption(id).getBytes("US-ASCII")
      assert(name === expected._1)
      assert(size === expected._2.length.toLong)
      assert(bytes.slice(off.toInt, (off + size).toInt) === expected._2)
    }
    // first data byte right after the first 512-byte header
    assert(es.head._2 === 512L)
  }

  test("interop: the system tar lists the same members in order") {
    val tarBin = new java.io.File("/usr/bin/tar")
    assume(tarBin.canExecute, "no system tar available")
    val dir = TarShards.ensure()
    val out = scala.sys.process.Process(
      Seq("/usr/bin/tar", "-tf", s"$dir/shard_00.tar")).!!
    val fromTar = out.linesIterator.toSeq
    val fromUs = parse(TarShards.shardBytes(0)).get.map(_._1)
    assert(fromTar === fromUs)
  }

  test("poison bytes: garbage null, truncation and corruption salvage") {
    assert(parse("definitely not a tar archive".getBytes) === None)
    assert(parse(Array.fill[Byte](2048)(0)) === None)
    val good = TarShards.shardBytes(1)
    // truncate mid-archive: the walk keeps the complete prefix
    val truncated = good.take(512 * 9)
    val sal = parse(truncated).get
    assert(sal.nonEmpty && sal.length < TarShards.SamplesPerShard * 2)
    // flip a byte in the THIRD header's checksum: first two members
    // survive, the walk stops cleanly at the corrupt block
    val hdr3 = {
      val e = parse(good).get(1)
      ((e._2 + e._3 + 511) / 512 * 512).toInt
    }
    val corrupt = good.clone()
    corrupt(hdr3 + 148) = 'x'.toByte
    assert(parse(corrupt).get.length === 2)
  }

  test("hostile size field can neither loop nor index negatively") {
    // the 12-byte octal size field admits values up to 8^11-1; a
    // checksum-valid header claiming 2^32-512 bytes has a padded
    // advance of exactly 2^32, which Int arithmetic would round to a
    // ZERO advance (infinite loop in the scan task) — and other giant
    // values would drive pos negative (AIOOBE). The walk must salvage
    // and terminate instead (ADVICE r11, medium).
    val loop = TarShards.headerBlock("evil.bin", (1L << 32) - 512L) ++
      new Array[Byte](1024)
    assert(parse(loop) === None) // no salvageable member; terminates
    // a 3 GiB claim AFTER a good member: the good prefix survives,
    // the hostile member is not emitted (its offset+size would send
    // the downstream slicer out of bounds)
    val good = TarShards.headerBlock("ok.bin", 4L) ++
      "abcd".getBytes("US-ASCII") ++ new Array[Byte](508)
    val hostile = good ++
      TarShards.headerBlock("evil.bin", 3L * 1024 * 1024 * 1024) ++
      new Array[Byte](1024)
    assert(parse(hostile).get === Seq(("ok.bin", 512L, 4L)))
  }

  test("octal field tolerates the space-padded rendering") {
    val b = TarShards.headerBlock("f.bin", 7L)
    // rewrite size as space-padded octal with space terminator
    "     7 ".getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) =>
      b(124 + i) = c
    }
    java.util.Arrays.fill(b, 131, 136, ' '.toByte)
    // fix the checksum for the edited block
    java.util.Arrays.fill(b, 148, 156, ' '.toByte)
    val sum = b.map(_ & 0xff).sum
    val cs = java.lang.Long.toOctalString(sum.toLong)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes, 0, b, 148, 6)
    b(154) = 0; b(155) = ' '
    val whole = b ++ "payload".getBytes ++ new Array[Byte](512 - 7) ++
      new Array[Byte](1024)
    assert(parse(whole).get === Seq(("f.bin", 512L, 7L)))
  }

  test("end-to-end: binaryFile + explode + binary substring slices members") {
    val dir = TarShards.ensure()
    val rows = spark.read.format("binaryFile").load(dir)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("shard"),
        explode(TarExprs.tarEntries(col("content"))).as("e"), col("content"))
      .select(col("shard"), col("e.name").as("name"),
        expr("substring(content, CAST(e.offset + 1 AS INT), CAST(e.size AS INT))")
          .as("bytes"))
      .collect()
    assert(rows.length ===
      TarShards.NumShards * TarShards.SamplesPerShard * 2)
    val byName = rows.map(r => r.getString(1) -> r.getAs[Array[Byte]](2)).toMap
    val id7 = 7
    assert(byName(TarShards.captionName(id7)) ===
      TarShards.caption(id7).getBytes("US-ASCII"))
    assert(byName(TarShards.imageName(id7)) === TarShards.imageBytes(id7))
  }

  test("q_tar_shards: one row per sample, dims and captions correct") {
    val df = graft.queries.TrainingQueries.qTarShards(spark, sf)
    val rows = df.collect()
    assert(rows.length === TarShards.NumShards * TarShards.SamplesPerShard)
    val r42 = rows.find(_.getString(1) == "sample_0042").get
    val (w, h) = TarShards.dims(42)
    assert(r42.getLong(2) === 2L)                    // n_members
    assert(r42.getString(3) === "png")               // 42 even
    assert(r42.getLong(5) === w.toLong)
    assert(r42.getLong(6) === h.toLong)
    assert(r42.getString(9) === TarShards.caption(42))
  }
}
