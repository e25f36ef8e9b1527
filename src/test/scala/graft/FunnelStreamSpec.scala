package graft

import org.apache.spark.sql.types._
import graft.streaming.{EventStream, FunnelStream}

class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  /** A doc that passes every gate: en, 61 words, "the" stopword,
    * letter-digit words (mean len in range), all bigrams distinct. */
  private def good(seed: Int): String =
    "the " + (1 to 60).map(i => s"w${seed}x$i").mkString(" ")
  /** Passes Gopher but trips the repetition flag (top bigram share
    * 0.5 over 61 words). */
  private def repetitive: String =
    "the " + Seq.fill(30)("abcd efgh").mkString(" ")

  private def drain(batches: Seq[Seq[(Long, String, String)]],
      compactEvery: Option[Int] = None, keepRecent: Int = 2)
      : (String, org.apache.spark.sql.DataFrame) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_funstream").toString
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
    (tmp, FunnelStream.runFunnel(spark, stream, "text", "doc_id", "lang",
      s"$tmp/index", s"$tmp/funnel", s"$tmp/ckpt", compactEvery,
      keepRecent))
  }

  // b0: two good docs + one German; b1: a cross-batch duplicate of
  // doc 1, an intra-batch duplicate pair, a repetitive doc; b2:
  // another copy of the batch-1 duplicate pair's text + a short doc
  private val batches = Seq(
    Seq((1L, good(1), "en"), (2L, good(2), "en"), (3L, good(3), "de")),
    Seq((4L, good(1), "en"), (5L, good(4), "en"), (6L, good(4), "en"),
      (7L, repetitive, "en")),
    Seq((8L, good(4), "en"), (9L, "the short one", "en")))

  test("streamed funnel log sums to the batch funnel of the whole corpus") {
    val (_, log) = drain(batches)
    val streamed = log.collect().map(r =>
      (r.getAs[Long]("batch"), r.getAs[Long]("stage_idx")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(streamed.keys.map(_._1).toSet == Set(0L, 1L, 2L))
    // per-stage cumulative sums == the batch twin over the union
    val want = graft.ops.Funnel.report(
      batches.flatten.toDF("doc_id", "text", "lang"),
      "text", "doc_id", "lang").collect().map(r =>
      r.getAs[Long]("stage_idx") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    (0L to 4L).foreach { st =>
      val d = (0L to 2L).map(b => streamed((b, st))._1).sum
      val t = (0L to 2L).map(b => streamed((b, st))._2).sum
      assert((d, t) == want(st), s"stage $st: streamed ($d,$t) != $want")
    }
    // spot-check the dedup stage per batch: batch 1's unique = doc 5
    // (4 is a cross-batch dup of 1, 6 an intra-batch dup of 5, 7
    // repetitive); batch 2's unique is empty (8 dups 5's text, 9 is
    // too short for Gopher)
    assert(streamed((1L, 4L))._1 == 1L)
    assert(streamed((2L, 4L))._1 == 0L)
  }

  test("in-drain index compaction bounds partitions without changing the log") {
    // keepRecent = 0 so the 3-batch drain performs a REAL rewrite
    // mid-stream (after batch 1: cutoff 1, partitions {0, 1} merge)
    val (tmp, log) = drain(batches, compactEvery = Some(2), keepRecent = 0)
    val (_, plain) = drain(batches)
    assert(log.collect().toSeq == plain.collect().toSeq)
    val parts = new java.io.File(s"$tmp/index").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(!parts.contains("batch=0"), s"no rewrite ran: $parts")
  }

  test("a half-written batch (index landed, funnel marker missing) replays cleanly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_funhalf").toString
    def run(b: Int): Unit = FunnelStream.funnelBatch(spark,
      batches(b).toDF("doc_id", "text", "lang"), "text", "doc_id", "lang",
      s"$tmp/index", s"$tmp/funnel", b.toLong)
    run(0)
    // simulate a crash between the index write and the funnel commit:
    // batch 1's index partition exists, its funnel marker does not
    graft.ops.Funnel.flags(batches(1).toDF("doc_id", "text", "lang"),
        "text", "doc_id", "lang")
      .filter(org.apache.spark.sql.functions.col("f3") === 1)
      .select("fp").limit(1)
      .write.mode("overwrite").parquet(s"$tmp/index/batch=1")
    run(1) // redelivery must overwrite the partial index, not read it
    run(2)
    val log = spark.read.option("basePath", s"$tmp/funnel")
      .parquet(s"$tmp/funnel")
    // totals must equal the clean 3-batch drain: the partial batch-1
    // index rows were invisible (batch < batchId) and overwritten
    val uniqueDocs = log.filter(org.apache.spark.sql.functions
        .col("stage_idx") === 4)
      .agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head().getLong(0)
    assert(uniqueDocs == 3L) // good(1), good(2), good(4)
  }

  test("funnel cycle is idempotent under at-least-once redelivery") {
    val (tmp, log) = drain(batches)
    val before = log.collect().toSeq
    // redeliver a committed batch id: the marker short-circuits
    FunnelStream.funnelBatch(spark,
      batches(1).toDF("doc_id", "text", "lang"), "text", "doc_id", "lang",
      s"$tmp/index", s"$tmp/funnel", 1L)
    val after = spark.read.option("basePath", s"$tmp/funnel")
      .parquet(s"$tmp/funnel")
      .withColumn("batch", org.apache.spark.sql.functions.col("batch")
        .cast("long"))
      .orderBy("batch", "stage_idx").collect().toSeq
    assert(after == before)
  }
}
