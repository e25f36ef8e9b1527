package graft

import org.apache.spark.sql.functions._
import graft.ops.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "cat dog cat"),          // tf(cat)=2, len 3
    (2L, "cat dog bird fish"),    // tf(cat)=1, len 4
    (3L, "cat"),                  // tf(cat)=1, len 1
    (4L, "dog dog dog"),
    (5L, "fish bird fish bird")).toDF("doc_id", "text")

  private def search(qs: Seq[(Long, String)], k: Int = 10,
      excludeSelf: Boolean = false) =
    Bm25.search(docs, "text", "doc_id", qs.toDF("q_id", "qtext"), k,
      excludeSelf = excludeSelf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("tf raises and length-normalization lowers a BM25 score") {
    val got = search(Seq((100L, "cat")))
    val ranked = got.map(x => x._3) // doc ids in rank order
    // avg_len = 3: doc 1 (tf 2, len 3) and doc 3 (tf 1, len 1) tie
    // EXACTLY (tfpart = 4.4/3.2 = 2.2/1.6 = 1.375 — doubled tf and
    // tripled length cancel), tie-break to the lower id; doc 2
    // (tf 1, len 4) trails on both counts
    assert(ranked === Seq(1L, 3L, 2L))
    val scores = got.map(_._4)
    assert(scores(0) === scores(1) && scores(1) > scores(2))
    assert(scores.forall(_ > 0))
  }

  test("rarer terms dominate a multi-term query (idf)") {
    // "bird" (df 2) is rarer than "dog" (df 3): doc 5 (bird x2, no dog)
    // must outrank doc 4 (dog x3, no bird)
    val got = search(Seq((100L, "dog bird")))
    val pos = got.map(x => x._3 -> x._2).toMap
    assert(pos(5L) < pos(4L))
  }

  test("excludeSelf drops exactly the query's own document") {
    val qs = Seq((1L, "cat dog cat"))
    val withSelf = search(qs).map(_._3).toSet
    val without = search(qs, excludeSelf = true).map(_._3).toSet
    assert(withSelf.contains(1L) && !without.contains(1L))
    assert(withSelf - 1L === without)
  }

  test("unknown terms contribute nothing; an all-unknown query returns no rows") {
    val a = search(Seq((100L, "cat zzz")))
    val b = search(Seq((100L, "cat")))
    assert(a.map(x => (x._3, x._4)).toSeq === b.map(x => (x._3, x._4)).toSeq)
    assert(search(Seq((100L, "zzz qqq"))).isEmpty)
  }

  test("RRF fuses ranks with exact integer contributions and fills missing arms with -1") {
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("q_id", "doc_id", "lex_rank")
    val sem = Seq((0L, 10L, 2L), (0L, 12L, 1L)).toDF("q_id", "doc_id", "sem_rank")
    val got = Bm25.rrfFuse(lex, sem, k = 10).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // doc 10: both arms -> 1e6/61 + 1e6/62 = 16393 + 16129
    // doc 11: lex only rank 2 -> 16129; doc 12: sem only rank 1 -> 16393
    assert(got(0) === ((10L, 16393L + 16129L, 1L, 2L)))
    assert(got(1) === ((12L, 16393L, -1L, 1L)))
    assert(got(2) === ((11L, 16129L, 2L, -1L)))
  }

  test("both-arms consensus outranks either single arm at equal rank") {
    val lex = Seq((0L, 10L, 3L), (0L, 11L, 1L)).toDF("q_id", "doc_id", "lex_rank")
    val sem = Seq((0L, 10L, 3L), (0L, 12L, 1L)).toDF("q_id", "doc_id", "sem_rank")
    val first = Bm25.rrfFuse(lex, sem, k = 1).collect().head
    assert(first.getLong(2) === 10L) // 2x rank-3 beats 1x rank-1
  }
}
