package graft

import graft.ops.Bpe

/** Distributed merge learning: exact parity with the driver-side
  * Sennrich loop, without any driver collect of the word table — the
  * route past `learnMerges`' LOUD `maxWords` ceiling. */
class BpeDistributedSpec extends SparkSpec {
  import spark.implicits._

  private val hf = Seq("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4,
      "hugs" -> 5)
    .flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("text")

  test("distributed learner reproduces the published worked example and the driver loop, to exhaustion") {
    val driver = Bpe.learnMergesByteLevel(hf, "text", 100)
    val dist = Bpe.learnMergesByteLevelDistributed(hf, "text", 100)
    assert(dist.take(3) === Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    assert(dist === driver)
    // letter path too (same corpus — bare lowercase words)
    assert(Bpe.learnMergesDistributed(hf, "text", 100) ===
      Bpe.learnMerges(hf, "text", 100))
  }

  test("distributed learner matches the driver loop on real corpus text, both alphabets") {
    val docs = graft.core.Tables.documents(spark, sf).limit(120).cache()
    val n = 12 // enough rounds to cross several symbol generations
    assert(Bpe.learnMergesDistributed(docs, "text", n) ===
      Bpe.learnMerges(docs, "text", n))
    assert(Bpe.learnMergesByteLevelDistributed(docs, "text", n) ===
      Bpe.learnMergesByteLevel(docs, "text", n))
    docs.unpersist()
  }

  test("past the driver bound: learnMerges throws at maxWords, the distributed route learns on") {
    val docs = graft.core.Tables.documents(spark, sf).limit(60)
    val e = intercept[IllegalArgumentException] {
      Bpe.learnMerges(docs, "text", 5, maxWords = 10)
    }
    assert(e.getMessage.contains("maxWords=10"))
    // the distributed learner has no word-table bound at all — same
    // corpus, first rules agree with an unbounded driver run
    val dist = Bpe.learnMergesDistributed(docs, "text", 5)
    assert(dist === Bpe.learnMerges(docs, "text", 5))
  }
}
