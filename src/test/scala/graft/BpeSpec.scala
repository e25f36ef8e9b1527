package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def segment(text: String, vocab: Seq[String]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(Bpe.tokens(col("t"), vocab).as("toks"))
      .collect()(0).getSeq[String](0)

  test("greedy longest-match segments on known vocab") {
    val vocab = Seq("lower", "low", "est", " lower", " low", "er")
    // pos 0: "lower" fails on 'lowes', falls to "low"; then "est";
    // then the space variant wins at its full length
    assert(segment("lowest lower", vocab) === Seq("low", "est", " lower"))
    // longest alternative taken when it does match
    assert(segment("lower lowest", vocab) === Seq("lower", " low", "est"))
  }

  test("unknown characters fall back to single-char tokens") {
    val vocab = Seq("low")
    assert(segment("xyz", vocab) === Seq("x", "y", "z"))
    assert(segment("low9low", vocab) === Seq("low", "9", "low"))
  }

  test("tokenCount equals segmentation length") {
    val df = Seq((1L, "lowest lower"), (2L, "xyz low"), (3L, "q"))
      .toDF("id", "t")
    val vocab = Seq("lower", "low", "est", " low")
    val r = df.select(
        Bpe.tokenCount(col("t"), vocab).as("n"),
        size(Bpe.tokens(col("t"), vocab)).cast("long").as("m"))
      .collect()
    r.foreach(row => assert(row.getLong(0) === row.getLong(1)))
  }

  test("learnVocab scores prefixes by merge savings, ties by piece") {
    val docs = Seq((1L, "aa aa aa"), (2L, "aa bb")).toDF("doc_id", "text")
    // candidates: "aa" n=2 s=2; " a" n=2 s=2; " aa" n=2 s=4;
    //             " b" n=1 s=1; " bb" n=1 s=2
    val top = Bpe.learnVocab(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.toSeq === Seq((" aa", 2L, 4L), (" a", 2L, 2L), (" bb", 1L, 2L)))
  }

  test("checked-in fixture matches learnVocab over the sf0.01 corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val learned = Bpe.learnVocab(docs, "text", 160)
      .collect().map(_.getString(0)).toVector
    assert(learned === Bpe.fixtureVocab)
  }

  test("vocab pieces must be metacharacter-free") {
    intercept[IllegalArgumentException] {
      Bpe.tokenPattern(Seq("a.b"))
    }
  }

  test("trie expression equals the regex path on adversarial random text") {
    // a 2-letter alphabet maximizes piece-boundary collisions (shared
    // prefixes, pieces that are prefixes of other pieces, matches that
    // straddle word boundaries via leading-space pieces)
    val rnd = new scala.util.Random(42)
    def word() = (1 to 1 + rnd.nextInt(4))
      .map(_ => "ab" (rnd.nextInt(2))).mkString
    val vocab = (1 to 24)
      .map(_ => (if (rnd.nextBoolean()) " " else "") + word())
      .distinct
    val texts = (0 until 300).map { i =>
      (i.toLong, (1 to rnd.nextInt(14)).map(_ => word()).mkString(" "))
    }
    val df = texts.toDF("id", "t")
    val r = df.select(
        Bpe.tokenCount(col("t"), vocab).as("regex"),
        Bpe.tokenCountFast(col("t"), vocab).as("trie"))
      .collect()
    r.foreach(row => assert(row.getLong(0) === row.getLong(1)))
    // empty text and fallback-only text
    val edge = Seq((1L, ""), (2L, "999 ##"), (3L, "  ")).toDF("id", "t")
    val e = edge.select(
        Bpe.tokenCount(col("t"), vocab).as("regex"),
        Bpe.tokenCountFast(col("t"), vocab).as("trie"))
      .collect()
    e.foreach(row => assert(row.getLong(0) === row.getLong(1)))
  }

  test("trie expression equals regex on the real corpus under the fixture vocab") {
    val docs = graft.core.Tables.documents(spark, sf)
    val bad = docs.select(
        Bpe.tokenCount(col("text"), Bpe.fixtureVocab).as("regex"),
        Bpe.tokenCountFast(col("text"), Bpe.fixtureVocab).as("trie"))
      .filter(col("regex") =!= col("trie")).count()
    assert(bad === 0L)
  }
}
