package graft

import graft.ops.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def words(r: Range, pre: String = "tok"): String =
    r.map(i => s"$pre$i").mkString(" ")

  test("chunks partition the token stream; expected length tracks the divisor") {
    val docs = Seq((1L, words(1 to 400))).toDF("doc_id", "text")
    val ch = Cdc.chunks(docs, "text", "doc_id", divisor = 16).collect()
    assert(ch.map(_.getLong(3)).sum === 400L) // every token in exactly one chunk
    // ~400/16 = 25 chunks expected; generous slack both ways
    assert(ch.length > 10 && ch.length < 60, s"${ch.length} chunks")
    // chunk indices are dense from 0
    assert(ch.map(_.getLong(1)).sorted.toSeq === (0L until ch.length).toSeq)
  }

  test("the CDC property: an insertion only perturbs its own neighborhood") {
    graft.core.CacheScope.withScope {
      val base = words(1 to 200)
      val edited = (words(1 to 100) + " INSERTED " + words(101 to 200))
      val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
      val rep = Cdc.report(docs, "text", "doc_id").collect()
        .map(r => r.getLong(0) ->
          (r.getLong(r.fieldIndex("n_chunks")),
           r.getLong(r.fieldIndex("n_shared_chunks")))).toMap
      val (n1, s1) = rep(1L)
      val (n2, s2) = rep(2L)
      // boundaries derive from token CONTENT, so every chunk not
      // containing the insertion point keeps its hash across the two
      // versions: at most 2 chunks per doc differ (the edited chunk,
      // plus one if INSERTED is itself a boundary token)
      assert(s1 >= n1 - 2, s"doc1 shares $s1 of $n1")
      assert(s2 >= n2 - 2, s"doc2 shares $s2 of $n2")
      assert(s1 < n1 || s2 < n2, "the edit must show up somewhere")
    }
  }

  test("report: disjoint docs share nothing") {
    graft.core.CacheScope.withScope {
      val docs = Seq(
        (1L, words(1 to 80)), (2L, words(1 to 80, "other")))
        .toDF("doc_id", "text")
      val rep = Cdc.report(docs, "text", "doc_id").collect()
        .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_shared_chunks")))
        .toMap
      assert(rep === Map(1L -> 0L, 2L -> 0L))
    }
  }
}
