package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.streaming.{CurationStream, EventStream}

class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private def good(seed: Int): String =
    "the " + (1 to 60).map(i => s"w${seed}x$i").mkString(" ")
  private def repetitive: String =
    "the " + Seq.fill(30)("abcd efgh").mkString(" ")

  // duplicates within and across batches, a non-en doc, a repetitive
  // doc, a too-short doc — the same gauntlet as FunnelStreamSpec
  private val batches = Seq(
    Seq((1L, good(1), "en"), (2L, good(2), "en"), (3L, good(3), "de")),
    Seq((4L, good(1), "en"), (5L, good(4), "en"), (6L, good(4), "en"),
      (7L, repetitive, "en")),
    Seq((8L, good(4), "en"), (9L, "the short one", "en")))

  test("continuous curation: admitted set and pack mass equal the batch twin") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_curstream").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text", "lang").coalesce(1)
        .write.parquet(s"$tmp/in/b$i.parquet")
    }
    EventStream.orderLanding(spark, s"$tmp/in/*.parquet", byName = true)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*.parquet")
    val manifest = CurationStream.runCurate(spark, stream,
      "text", "doc_id", "lang", s"$tmp/index", s"$tmp/admitted",
      s"$tmp/manifest", s"$tmp/ckpt", budget = 64L, nShards = 2)

    // the batch twin: funnel survivors of the whole corpus
    val union = batches.flatten.toDF("doc_id", "text", "lang")
    val twinSurv = graft.ops.Funnel.uniqueWithin(
        graft.ops.Funnel.flags(union, "text", "doc_id", "lang"))
      .collect().map(r => r.getAs[Long]("id")).toSet
    val admitted = spark.read.option("basePath", s"$tmp/admitted")
      .parquet(s"$tmp/admitted")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(admitted == twinSurv) // {1, 2, 5}: id-ordered arrival = min-id
    // manifest mass = admitted docs' tokens (61 words each)
    val mass = manifest.agg(org.apache.spark.sql.functions
      .sum("pack_tokens")).head().getLong(0)
    assert(mass == 61L * admitted.size)
    // every manifest row's first_doc was admitted in ITS batch (packs
    // never span batches)
    val byBatch = spark.read.option("basePath", s"$tmp/admitted")
      .parquet(s"$tmp/admitted")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("batch")).toMap
    manifest.collect().foreach { r =>
      assert(byBatch(r.getAs[Long]("first_doc")) ==
        r.getAs[Long]("batch").toInt)
    }

    // redelivery of a committed batch is a no-op
    val before = manifest.collect().toSeq
    CurationStream.curateBatch(spark,
      batches(1).toDF("doc_id", "text", "lang"), "text", "doc_id", "lang",
      s"$tmp/index", s"$tmp/admitted", s"$tmp/manifest", 1L, 64L, 2)
    val after = spark.read.option("basePath", s"$tmp/manifest")
      .parquet(s"$tmp/manifest")
      .withColumn("batch", col("batch").cast("long"))
      .orderBy("batch", "shard", "pack_id").collect().toSeq
    assert(after == before)
  }

  test("decontaminating drain: eval copies never reach the manifest") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_curdc").toString
    val evalText = good(90)
    // batch 0: an exact and a near copy of the eval doc (both pass
    // every quality gate) beside a clean doc duplicated across batches
    val dcBatches = Seq(
      Seq((1L, evalText, "en"), (2L, good(1), "en"),
        (3L, evalText + " extra tail words here", "en")),
      Seq((4L, good(1), "en"), (5L, good(2), "en")))
    dcBatches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text", "lang").coalesce(1)
        .write.parquet(s"$tmp/in/b$i.parquet")
    }
    EventStream.orderLanding(spark, s"$tmp/in/*.parquet", byName = true)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*.parquet")
    val evalDf = Seq((900L, evalText)).toDF("doc_id", "text")
    CurationStream.runCurate(spark, stream,
      "text", "doc_id", "lang", s"$tmp/index", s"$tmp/admitted",
      s"$tmp/manifest", s"$tmp/ckpt", budget = 64L, nShards = 2,
      evalDf = Some(evalDf))
    val admitted = spark.read.option("basePath", s"$tmp/admitted")
      .parquet(s"$tmp/admitted")
      .collect().map(_.getAs[Long]("id")).toSet
    // 1 (exact eval copy) and 3 (near copy) are gone; 2 admitted in
    // batch 0; 4 rejected as a cross-batch dup of 2; 5 admitted
    assert(admitted === Set(2L, 5L))

    // one-batch composition: a contaminated doc (lowest id) beside a
    // clean duplicated pair — decon drops 10, first-wins keeps 11
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_curdc2").toString
    val dupText = good(91)
    CurationStream.curateBatch(spark,
      Seq((10L, dupText + " " + evalText, "en"), // contaminated
        (11L, dupText, "en"), (12L, dupText, "en"))
        .toDF("doc_id", "text", "lang"),
      "text", "doc_id", "lang", s"$tmp2/index", s"$tmp2/admitted",
      s"$tmp2/manifest", 0L, 64L, 2, Some(evalDf))
    val admitted2 = spark.read.option("basePath", s"$tmp2/admitted")
      .parquet(s"$tmp2/admitted")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(admitted2 === Set(11L))
  }

  test("mixing drain: fixed rates replicate per the batch operator's exact formula") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_curmix").toString
    // srcA at 2.0 epochs (always 2 copies), srcB at 0 (dropped),
    // srcC at 0.5 (kept iff the salted draw lands under the rate)
    val rates = Seq("srcA" -> 2000000L, "srcB" -> 0L, "srcC" -> 500000L)
    // doc 1 arrives TWICE in the batch (redelivered row): the funnel
    // admits one survivor, and the source lookup must not multiply
    // its copies
    val rows = Seq(
      (1L, good(50), "en", "srcA"), (1L, good(50), "en", "srcA"),
      (2L, good(51), "en", "srcB"),
      (3L, good(52), "en", "srcC"), (4L, good(53), "en", "srcC"),
      (5L, good(54), "en", "srcC"), (6L, good(55), "en", "srcC"))
    CurationStream.curateBatch(spark,
      rows.toDF("doc_id", "text", "lang", "source"),
      "text", "doc_id", "lang", s"$tmp/index", s"$tmp/admitted",
      s"$tmp/manifest", 0L, 1024L, 2, mixRatesPpm = Some(rates))
    val admitted = spark.read.option("basePath", s"$tmp/admitted")
      .parquet(s"$tmp/admitted")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("epoch")))
    // the exact batch-operator formula, replayed driver-side
    def copies(id: Long, ratePpm: Long): Long = {
      val h = graft.functions.HashParity.md5Hex(s"$id#mix").take(7)
      val ppm = java.lang.Long.parseLong(h, 16) % 1000000L
      math.max(0L, (ratePpm + 999999L - ppm) / 1000000L)
    }
    val want = rows.flatMap { case (id, _, _, src) =>
      val r = rates.toMap.apply(src)
      (0L until copies(id, r)).map(e => (id, e))
    }.toSet
    assert(admitted.toSet === want)
    assert(admitted.count(_._1 == 1L) === 2) // srcA: exactly 2 epochs
    assert(!admitted.exists(_._1 == 2L)) // srcB dropped entirely
    // manifest mass equals the copies' token mass (61 words each)
    val mass = spark.read.option("basePath", s"$tmp/manifest")
      .parquet(s"$tmp/manifest")
      .agg(org.apache.spark.sql.functions.sum("pack_tokens"))
      .head().getLong(0)
    assert(mass === 61L * want.size)
  }
}
