package graft

import graft.ops.LangModel

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("add-one bigram costs match the hand computation") {
    // ref "a b a b c": ctx a->2 b->2; bigrams (a,b)->2 (b,a)->1
    // (b,c)->1; V = 3
    val ref = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c"), // (a,b): 1e6*5 DIV 3 = 1666666; (b,c): 1e6*5 DIV 2 = 2500000
      (2L, "z z"),   // unseen ctx: 1e6*(0+3) DIV 1 = 3000000
      (3L, "a"))     // no bigrams
      .toDF("doc_id", "text")
    val r = LangModel.perplexityReport(corpus, ref, "text", "doc_id",
        keepAtMeanCost = 2500000L)
      .orderBy("id").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toSeq
      === Seq(
        (2L, 4166666L, 2083333L, 1L),  // 4166666 <= 2 * 2500000
        (1L, 3000000L, 3000000L, 0L),  // 3000000 >  1 * 2500000
        (0L, 0L, 0L, 1L)))             // no evidence -> keep
  }

  test("fluent text scores below out-of-domain gibberish") {
    val ref = Seq.tabulate(20)(i =>
      (100L + i, "the cat sat on the mat and the dog ran to the cat"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zk qv wx mat cat pq zz"))
      .toDF("doc_id", "text")
    // threshold above capCost is clamped (everything keeps) — the
    // assertion is about mean-cost ORDER, not the verdict
    val r = LangModel.perplexityReport(corpus, ref, "text", "doc_id",
        keepAtMeanCost = Long.MaxValue / 4)
      .orderBy("id").collect()
    assert(r.forall(_.getLong(4) === 1L))
    assert(r(0).getLong(3) < r(1).getLong(3)) // mean_cost
  }

  test("capCost bounds the unseen-bigram penalty") {
    val ref = Seq((100L, "a b")).toDF("doc_id", "text")
    val corpus = Seq((1L, "z z")).toDF("doc_id", "text")
    val r = LangModel.perplexityReport(corpus, ref, "text", "doc_id",
        keepAtMeanCost = 0L, capCost = 2000000L)
      .collect()
    assert(r(0).getLong(2) === 2000000L) // raw 1e6*(0+2) DIV 1 = 2000000; cap binds at lower values
    val r2 = LangModel.perplexityReport(corpus, ref, "text", "doc_id",
        keepAtMeanCost = 0L, capCost = 1500000L)
      .collect()
    assert(r2(0).getLong(2) === 1500000L)
  }

  test("keep verdict is length-invariant under cross-multiplication") {
    val ref = Seq((100L, "a b a b a b")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b"),
      (2L, "a b a b a b a b"))
      .toDF("doc_id", "text")
    // doc 2 is doc 1's bigram mixture at 7 bigrams vs 1 — every
    // bigram (a,b) or (b,a) is ref-seen, so mean cost is similar and
    // the verdict must agree at a threshold between the two regimes
    val r = LangModel.perplexityReport(corpus, ref, "text", "doc_id",
        keepAtMeanCost = 3000000L)
      .orderBy("id").collect()
    assert(r(0).getLong(4) === r(1).getLong(4))
  }
}
