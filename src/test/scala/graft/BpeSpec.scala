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

  test("trie and regex count astral-plane characters identically (one per code point)") {
    // ADVICE r6: the trie consumes one UTF-8 code point on fallback;
    // Java regex `[\s\S]` also matches a supplementary character as a
    // single unit (Pattern is code-point based), as does RE2 — so all
    // three paths agree beyond the BMP. Pinned here, not just argued.
    val vocab = Seq("low", " low", "er")
    val astral = Seq(
      (1L, "𝄞"),                    // U+1D11E musical G clef
      (2L, "low𝄞er"),               // astral char splits pieces
      (3L, "😀😀 low"),    // two emoji + the " low" piece
      (4L, "a𝄞b𝄞c")).toDF("id", "t")
    val r = astral.select(
        Bpe.tokenCount(col("t"), vocab).as("regex"),
        Bpe.tokenCountFast(col("t"), vocab).as("trie"))
      .collect()
    r.foreach(row => assert(row.getLong(0) === row.getLong(1)))
    // and the absolute counts are code-point counts, not UTF-16 units
    val abs = astral.select(col("id"),
        Bpe.tokenCountFast(col("t"), vocab).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(abs === Map(1L -> 1L, 2L -> 3L, 3L -> 3L, 4L -> 5L))
  }

  test("prodVocab: 50,000 pieces, shape-legal, prefix-closed") {
    val v = Bpe.prodVocab
    assert(v.size === 50000)
    assert(v.distinct.size === 50000)
    val set = v.toSet
    v.foreach { p =>
      assert(p.matches(Bpe.PreTokenPattern))
      // prefix closure: greedy falling off a long piece lands on a
      // shorter piece (every proper prefix that is itself a legal
      // piece shape is present)
      (1 until p.length).foreach { k =>
        val pre = p.substring(0, k)
        if (pre != " ") assert(set.contains(pre), s"missing prefix '$pre' of '$p'")
      }
    }
  }

  /** Pure-Scala closed form of greedy longest-match under prodVocab —
    * the same derivation the DuckDB oracle uses
    * ([[Bpe.prodTokensSqlExpr]]), independent of the trie. */
  private def prodClosedForm(t: String): Long = {
    val m = java.util.regex.Pattern.compile(" [a-z]+|[a-z]+|[\\s\\S]").matcher(t)
    var n = 0L
    while (m.find()) {
      val s = m.group()
      n += (if (s.startsWith(" ") && s.length >= 2) {
        val r = s.length - 1
        val first =
          if (r >= 4 && s.substring(1, 5) < Bpe.ProdVocab4Cut) 4 else math.min(r, 3)
        1L + ((r - first) + 2) / 3
      } else if (s.forall(c => c >= 'a' && c <= 'z')) (s.length + 2) / 3
      else 1L)
    }
    n
  }

  test("50k-piece trie equals the closed form on the corpus and adversarial text") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val got = docs
      .withColumn("n", Bpe.prodTokenCount(col("text")))
      .collect().map(r => r.getString(1) -> r.getLong(2))
    got.foreach { case (t, n) => assert(n === prodClosedForm(t), t.take(60)) }
    val rnd = new scala.util.Random(7)
    val adv = (0 until 200).map { i =>
      val s = (0 until rnd.nextInt(30)).map { _ =>
        rnd.nextInt(6) match {
          case 0 => " "
          case 1 => ('a' + rnd.nextInt(26)).toChar.toString
          case 2 => "atx" // straddles the 4-cut
          case 3 => ('A' + rnd.nextInt(26)).toChar.toString
          case 4 => rnd.nextInt(10).toString
          case _ => ('a' + rnd.nextInt(3)).toChar.toString * (1 + rnd.nextInt(6))
        }
      }.mkString
      (i.toLong, s)
    }
    val advGot = adv.toDF("id", "t")
      .select(col("t"), Bpe.prodTokenCount(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    advGot.foreach { case (t, n) => assert(n === prodClosedForm(t), s"'$t'") }
  }

  test("trie tokenize array equals the regex tokens path (pieces, not just counts)") {
    val rnd = new scala.util.Random(99)
    def word() = (1 to 1 + rnd.nextInt(4))
      .map(_ => "ab" (rnd.nextInt(2))).mkString
    val vocab = (1 to 24)
      .map(_ => (if (rnd.nextBoolean()) " " else "") + word())
      .distinct
    val texts = (0 until 200).map { i =>
      (i.toLong, (1 to rnd.nextInt(14)).map(_ => word()).mkString(" "))
    } ++ Seq((900L, ""), (901L, "low𝄞er 99"), (902L, "  "))
    val r = texts.toDF("id", "t")
      .select(
        Bpe.tokens(col("t"), vocab).as("regex"),
        Bpe.tokensFast(col("t"), vocab).as("trie"))
      .collect()
    r.foreach { row =>
      assert(row.getSeq[String](0) === row.getSeq[String](1))
    }
    // and under the 50k prodVocab on real corpus text
    val docs = graft.core.Tables.documents(spark, sf)
    val bad = docs.select(
        Bpe.tokens(col("text"), Bpe.prodVocab.take(500)).as("regex"),
        Bpe.tokensFast(col("text"), Bpe.prodVocab.take(500)).as("trie"))
      .filter(col("regex") =!= col("trie")).count()
    assert(bad === 0L)
  }

  // ---- merge-ranked (true) BPE -------------------------------------------

  test("learnMerges reproduces the hand-computed Sennrich sequence") {
    // corpus: hug / pug / pun / bun / hugs (the standard educational
    // BPE example). Pair counts by hand: (u,g)=3 wins round 1; round
    // 2 ties (h,ug)=( ,p)=(u,n)=2 and ' ' < 'h' < 'u' breaks to
    // ( ,p); round 3 ties (h,ug)=(u,n)=2, 'h' < 'u' -> (h,ug).
    val docs = Seq((1L, "hug pug pun bun hugs")).toDF("doc_id", "text")
    val merges = graft.ops.Bpe.learnMerges(docs, "text", 3)
    assert(merges === Seq(("u", "g"), (" ", "p"), ("h", "ug")))
  }

  test("merge application follows rank order, not match length") {
    // rank order deliberately conflicts with greedy longest-match:
    // ("l","o") then ("lo","w") then (" ","low") then ("e","r")
    val merges = Seq(("l", "o"), ("lo", "w"), (" ", "low"), ("e", "r"))
    val ranker = new graft.functions.MergeRanker(merges)
    assert(ranker.segmentWord("low").toSeq === Seq("low"))
    assert(ranker.segmentWord(" lower").toSeq === Seq(" low", "er"))
    assert(ranker.segmentWord(" lowest").toSeq === Seq(" low", "e", "s", "t"))
    assert(ranker.segmentWord(" LOW").toSeq === Seq(" ", "L", "O", "W"))
    // overlap resolves leftmost-first: aaa + (a,a) -> [aa, a]
    val rep = new graft.functions.MergeRanker(Seq(("a", "a")))
    assert(rep.segmentWord("aaa").toSeq === Seq("aa", "a"))
    assert(rep.segmentWord("aaaa").toSeq === Seq("aa", "aa"))
  }

  test("countTokens = merge-segmented runs + one token per other code point") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val df = Seq(
        (1L, "low lower"),   // [low] + [" ","l","o","w","e","r" -> ...]
        (2L, "low9𝄞 er")).toDF("id", "t")
    val r = df.select(col("id"),
        graft.ops.Bpe.mergeTokenCount(col("t"), merges).as("n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // "low lower": [low] ++ [" ","low","er"] = 4 (no (" ","low") rule)
    // "low9𝄞 er": [low] + "9" + astral + " " is followed by letters
    //   -> " er" run: [" ","er"] = 2; total 1+1+1+2 = 5
    assert(r === Map(1L -> 4L, 2L -> 5L))
  }

  test("merge tokenize array matches the per-word segmentation and the count") {
    val merges = Seq(("l", "o"), ("lo", "w"), ((" "), ("low")), ("e", "r"))
    val df = Seq((1L, "low lower x9"), (2L, "𝄞 low")).toDF("id", "t")
    val r = df.select(col("id"),
        graft.ops.Bpe.mergeTokens(col("t"), merges).as("p"),
        graft.ops.Bpe.mergeTokenCount(col("t"), merges).as("n"))
      .collect().map(x => x.getLong(0) ->
        (x.getSeq[String](1), x.getLong(2))).toMap
    assert(r(1L)._1 === Seq("low", " low", "er", " ", "x", "9"))
    assert(r(2L)._1 === Seq("𝄞", " low"))
    r.values.foreach { case (p, n) => assert(p.length.toLong === n) }
  }

  test("gpt2-convention merges file loads verbatim") {
    val lines = Seq("Ġ t", "t he", "Ġt he", "# comment", "")
    assert(graft.ops.Bpe.parseGpt2Merges(lines) ===
      Seq((" ", "t"), ("t", "he"), (" t", "he")))
  }

  test("checked-in merge fixture matches learnMerges over the sf0.01 corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val learned = graft.ops.Bpe.learnMerges(docs, "text", 200)
    // the corpus exhausts (no pair occurs twice) after 127 rules —
    // the learner's documented stopping rule, not a truncation
    assert(learned.size === 127)
    assert(learned === graft.ops.Bpe.fixtureMerges)
  }

  test("one-at-a-time leftmost merging reaches the same fixpoint (oracle equivalence)") {
    // the DuckDB oracle merges ONE leftmost min-rank occurrence per
    // recursion step; the expression merges all occurrences per pass.
    // Equal for any learned merge list (later rules build on earlier
    // symbols) — checked here on every distinct corpus pre-token.
    val merges = graft.ops.Bpe.fixtureMerges
    val ranker = new graft.functions.MergeRanker(merges)
    val rank = merges.zipWithIndex.toMap
    def oneAtATime(w: String): Seq[String] = {
      var syms = w.map(_.toString).toVector
      var done = false
      while (!done && syms.length > 1) {
        val ranked = syms.indices.dropRight(1)
          .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
        if (ranked.isEmpty) done = true
        else {
          val (r, i) = ranked.min
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
          require(r >= 0)
        }
      }
      syms
    }
    val words = graft.core.Tables.documents(spark, sf)
      .select(explode(regexp_extract_all(col("text"),
        lit(graft.ops.Bpe.PreTokenPattern), lit(0))).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(ranker.segmentWord(w).toSeq === oneAtATime(w), s"word '$w'")
    }
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
