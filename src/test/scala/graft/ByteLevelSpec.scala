package graft

import org.apache.spark.sql.functions._
import graft.functions.ByteBpeRanker
import graft.ops.{Bpe, ByteLevel}

/** Byte-level (full GPT-2 construction) fidelity: the byte alphabet,
  * the pre-tokenization regex, the merge loop, and the learner are
  * each pinned against PUBLISHED values — the GPT-2 byte-encoder's
  * known mappings, the pre-tokenizer's documented splits (including
  * the lookahead whitespace-donation cases the SQL oracle can't
  * replay), and the Hugging Face LLM-course worked BPE-training
  * example (hug/pug/pun/bun/hugs) with its published merge sequence.
  */
class ByteLevelSpec extends SparkSpec {
  import spark.implicits._

  // ---- byte alphabet (published GPT-2 bytes_to_unicode facts) -----------

  test("byte table: published mappings — Ġ=space, Ċ=newline, ĉ=tab, Ń=0xAD; printables map to themselves") {
    assert(ByteLevel.byteToChar(' '.toInt) === 'Ġ')   // U+0120, the famous one
    assert(ByteLevel.byteToChar('\n'.toInt) === 'Ċ')  // U+010A
    assert(ByteLevel.byteToChar('\t'.toInt) === 'ĉ')  // U+0109
    assert(ByteLevel.byteToChar(0) === 'Ā')           // U+0100
    assert(ByteLevel.byteToChar(0x7f) === 'ġ')        // DEL, first after space
    assert(ByteLevel.byteToChar(0xad) === 'Ń')        // soft hyphen, U+0143
    // the 188 printable latin-1 bytes are fixed points
    (Seq('!', 'A', 'z', '~', '¡', '¬', '®', 'ÿ')).foreach { c =>
      assert(ByteLevel.byteToChar(c.toInt) === c)
    }
    // total bijection over 256 bytes
    assert(ByteLevel.byteToChar.distinct.length === 256)
  }

  test("encode: multi-byte UTF-8 splits per byte ('é' → 'Ã©'); decode inverts exactly") {
    assert(ByteLevel.encode("é") === "Ã©")
    assert(ByteLevel.encode(" the") === "Ġthe")
    assert(ByteLevel.encode("a\nb") === "aĊb")
    val samples = Seq("", "hello world", "naïve café", "héllo…\t\n",
      "数据", "🙂ok", (0 until 256).map(_.toChar).mkString)
    samples.foreach(s => assert(ByteLevel.decode(ByteLevel.encode(s)) === s))
  }

  // ---- pre-tokenizer (published GPT-2 regex semantics) -------------------

  private def pre(s: String): Vector[String] = ByteLevel.preTokenize(s)

  test("pre-tokenizer: published splits — words, contractions, numbers, punctuation") {
    assert(pre("Hello world!") === Vector("Hello", " world", "!"))
    assert(pre("don't stop") === Vector("don", "'t", " stop"))
    assert(pre("I've 123 45.6") ===
      Vector("I", "'ve", " 123", " 45", ".", "6"))
    assert(pre("we'll they're it's I'm you'd") === Vector(
      "we", "'ll", " they", "'re", " it", "'s", " I", "'m", " you", "'d"))
    assert(pre("naïve café") === Vector("naïve", " café"))
    assert(pre("a—b") === Vector("a", "—", "b"))
  }

  test("pre-tokenizer: whitespace donation (the lookahead) — interior runs give their last space to the next run") {
    assert(pre("a  b") === Vector("a", " ", " b"))        // 2 spaces: 1 + donated
    assert(pre("a    b") === Vector("a", "   ", " b"))
    assert(pre("ab  ") === Vector("ab", "  "))            // trailing run stays whole
    assert(pre("a \n b") === Vector("a", " \n", " b"))
    assert(pre("x   's") === Vector("x", "  ", " '", "s")) // donated space + quote re-split
    assert(pre("a b") === Vector("a", " ", "b")) // unicode \s (the (?U) flag)
  }

  test("pre-tokenizer is a partition: concatenating matches reproduces the input") {
    Seq("Hello, world! don't   stop\n\n 123.45é🙂 ", "", " ", "\t\t")
      .foreach(s => assert(pre(s).mkString === s))
  }

  // ---- merge application (published format, arbitrary alphabets) ---------

  test("a GPT-2-format merges file with digit/punct/non-ASCII rules reproduces its segmentation verbatim") {
    val merges = Bpe.parseMergesVerbatim(Seq(
      "#version: 0.2",
      "Ġ t", "Ġt h", "Ġth e",   // space participates (as Ġ)
      "1 2", "12 3",            // digits participate
      ". .",                    // punctuation participates
      "Ã ©",                    // a non-ASCII byte pair participates
      "# #"))                   // '#' is a SYMBOL, not a comment marker
    val r = new ByteBpeRanker(merges)
    def seg(s: String): Seq[String] = {
      import org.apache.spark.unsafe.types.UTF8String
      r.tokenize(UTF8String.fromString(s)).array.toSeq
        .map(_.asInstanceOf[UTF8String].toString)
    }
    assert(seg(" the") === Seq("Ġthe"))
    assert(seg("a123") === Seq("a", "123"))
    assert(seg("...!") === Seq("..", ".", "!"))
    assert(seg("café") === Seq("c", "a", "f", "Ã©"))
    assert(seg("## x") === Seq("##", "Ġ", "x")) // the rule a comment filter would eat
    // letter-only path CANNOT express any of the last three — the
    // round-7 gap this module closes
  }

  test("empty merge list: token count is exactly the UTF-8 byte count (the published base case)") {
    val r = new ByteBpeRanker(Seq.empty)
    import org.apache.spark.unsafe.types.UTF8String
    def n(s: String): Long = r.countTokens(UTF8String.fromString(s))
    assert(n("hello") === 5L)
    assert(n("é") === 2L)      // 2 UTF-8 bytes
    assert(n("🙂") === 4L)     // 4 UTF-8 bytes
    assert(n("a b") === 3L)    // " b" pre-token = Ġ + b
    assert(n("") === 0L)
  }

  // ---- learner (published worked example) --------------------------------

  test("learner reproduces the Hugging Face course's worked BPE example: (u,g), (u,n), (h,ug)") {
    // corpus: "hug"x10 "pug"x5 "pun"x12 "bun"x4 "hugs"x5, one word per
    // row (bare words — no leading space, so byte symbols are plain
    // letters and the published merge sequence applies verbatim)
    val words = Seq("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4,
      "hugs" -> 5)
    val df = words.flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("text")
    assert(Bpe.learnMergesByteLevel(df, "text", 3) ===
      Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  // ---- fixture + expression wiring ---------------------------------------

  test("checked-in byte-level fixture matches learnMergesByteLevel over the sf0.01 corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val learned = Bpe.learnMergesByteLevel(docs, "text", 500)
    assert(learned.size === 127) // exhaustion, not truncation
    assert(learned === Bpe.fixtureMergesByteLevel)
    // and the stored format round-trips bit-for-bit
    val in = getClass.getResourceAsStream("/graft/bpe_merges_bytelevel.txt")
    val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(stored === Bpe.renderMergesGpt2(learned))
  }

  test("expression token count equals the sum of per-pre-token segment lengths on corpus text") {
    val docs = graft.core.Tables.documents(spark, sf).limit(50)
    val ranker = new ByteBpeRanker(Bpe.fixtureMergesByteLevel)
    val got = docs.select(col("text"),
        Bpe.byteTokenCount(col("text"), Bpe.fixtureMergesByteLevel).as("n"))
      .collect()
    got.foreach { r =>
      val expect = ByteLevel.preTokenize(r.getString(0))
        .map(w => ranker.segmentPreToken(w).length.toLong).sum
      assert(r.getLong(1) === expect)
    }
  }

  test("token ids: the PUBLISHED base numbering ('!'=0, 'A'=32, 'Ċ'=198, 'Ġ'=220) then 256+rank for merge products") {
    import org.apache.spark.unsafe.types.UTF8String
    def ids(r: ByteBpeRanker, s: String): Seq[Int] =
      r.tokenIds(UTF8String.fromString(s)).array.toSeq.map(_.asInstanceOf[Int])
    // known GPT-2 vocab facts: base symbols numbered by ascending
    // mapped code point, NOT raw byte value
    assert(ByteLevel.symbolsByIdOrder(0) === '!')
    assert(ByteLevel.symbolsByIdOrder(32) === 'A')
    assert(ByteLevel.symbolsByIdOrder(198) === 'Ċ') // newline
    assert(ByteLevel.symbolsByIdOrder(220) === 'Ġ') // space
    val base = new ByteBpeRanker(Seq.empty)
    assert(ids(base, "Ab") === Seq(32, 65))   // 'A'=32, 'b'='b'-'!'=65
    assert(ids(base, " a") === Seq(220, 64))  // Ġ=220
    assert(ids(base, "é") === Seq(127, 102))  // Ã (0xC3), © (0xA9) sorted ranks
    // merge products number 256 + rank, exactly the published scheme
    val r = new ByteBpeRanker(Seq(("a", "b"), ("ab", "c")))
    assert(ids(r, "abc xy abq") ===
      Seq(257, 220, 87, 88, 220, 256, 80)) // "abc"=256+1, "ab"=256+0
  }

  test("eosId: special tokens number after merge products — 50,000 rules put end-of-text at GPT-2's published 50256") {
    assert(Bpe.eosId(Seq.fill(50000)(("a", "b"))) === 50256)
    assert(Bpe.eosId(Seq.empty) === 256) // first id past the byte alphabet
    // never collides with a real piece id
    assert(Bpe.eosId(Bpe.fixtureMergesByteLevel) ===
      256 + Bpe.fixtureMergesByteLevel.size)
  }

  test("token ids round-trip: ids -> pieces -> decode reproduces corpus text exactly") {
    val merges = Bpe.fixtureMergesByteLevel
    val vocab: Map[Int, String] =
      (ByteLevel.symbolsByIdOrder.zipWithIndex
        .map { case (c, id) => id -> c.toString } ++
        merges.zipWithIndex.map { case ((a, b), i) => (256 + i) -> (a + b) })
        .toMap
    val ranker = new ByteBpeRanker(merges)
    import org.apache.spark.unsafe.types.UTF8String
    graft.core.Tables.documents(spark, sf).limit(30)
      .select("text").collect().map(_.getString(0)).foreach { t =>
      val ids = ranker.tokenIds(UTF8String.fromString(t))
        .array.toSeq.map(_.asInstanceOf[Int])
      assert(ByteLevel.decode(ids.map(vocab).mkString) === t)
    }
  }

  test("byteDecodeIds inverts byteTokenIds in-plan, including non-ASCII text") {
    import spark.implicits._
    val merges = Bpe.fixtureMergesByteLevel
    // adversarial strings: multi-byte UTF-8, digits, punctuation,
    // astral plane, contractions, interior whitespace runs
    val texts = Seq("héllo wörld", "aé世界 42!", "it's 3.14",
      "😀 ok", "tabs\tand\nnewlines", "", "  double  spaces")
    val r = texts.toDF("text")
      .select(col("text"),
        Bpe.byteDecodeIds(Bpe.byteTokenIds(col("text"), merges), merges)
          .as("decoded"))
      .collect()
    r.foreach(x => assert(x.getString(1) === x.getString(0)))
    // out-of-vocab ids fail loudly
    val bad = Seq(Seq(0, 999999)).toDF("ids")
      .select(Bpe.byteDecodeIds(col("ids"), merges))
    assertThrows[Exception](bad.collect())
  }

  test("byteTokens and byteTokenCount agree; pieces decode back to the document") {
    val docs = graft.core.Tables.documents(spark, sf).limit(20)
    val rows = docs.select(col("text"),
        Bpe.byteTokens(col("text"), Bpe.fixtureMergesByteLevel).as("pieces"),
        Bpe.byteTokenCount(col("text"), Bpe.fixtureMergesByteLevel).as("n"))
      .collect()
    rows.foreach { r =>
      val pieces = r.getSeq[String](1)
      assert(pieces.size.toLong === r.getLong(2))
      assert(ByteLevel.decode(pieces.mkString) === r.getString(0))
    }
  }
}
