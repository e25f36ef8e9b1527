package graft

import org.apache.spark.sql.functions._
import graft.ops.Mix

class MixSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 40L).map { i =>
    val src = if (i < 20) "a" else "b"
    (i, src, "w " * 9 + "w") // 10 whitespace tokens per doc
  }.toDF("doc_id", "source", "text")

  test("rates derive from availability and cap at 1") {
    // a: 200 tokens avail, target 0.5*160=80 -> rate 400000 ppm
    // b: 200 tokens avail, target 1.0... weight 0.5 -> 80 -> same
    val r = Mix.mix(docs, "text", "doc_id", "source",
        Seq("a" -> 0.5, "b" -> 0.5), budgetTokens = 160L, salt = "t")
      .select("source", "rate_ppm", "avail_tokens", "target_tokens")
      .distinct().collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r("a") === (400000L, 200L, 80L))
    assert(r("b") === (400000L, 200L, 80L))

    // oversized budget: rate caps at 1000000, everything kept
    val all = Mix.mix(docs, "text", "doc_id", "source",
      Seq("a" -> 0.5, "b" -> 0.5), budgetTokens = 100000L, salt = "t")
    assert(all.count() === 40L)
    assert(all.select("rate_ppm").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(1000000L))
  }

  test("unlisted sources are dropped; audit counts the kept set") {
    val r = Mix.mix(docs, "text", "doc_id", "source",
      Seq("a" -> 1.0), budgetTokens = 100000L, salt = "t")
    assert(r.select("source").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("a"))
    val audit = r.select("src_kept_docs", "src_kept_tokens")
      .distinct().collect()(0)
    assert(audit.getLong(0) === 20L && audit.getLong(1) === 200L)
  }

  test("a lower budget is a subset of a higher budget under one salt") {
    def ids(budget: Long): Set[Long] =
      Mix.mix(docs, "text", "doc_id", "source",
          Seq("a" -> 0.5, "b" -> 0.5), budget, salt = "t")
        .select("id").collect().map(_.getLong(0)).toSet
    val small = ids(100L)
    val big = ids(300L)
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("mix is invariant to partitioning and row order") {
    val shuffled = docs.orderBy(rand(7)).repartition(7)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Mix.mix(df, "text", "doc_id", "source",
          Seq("a" -> 0.7, "b" -> 0.3), 150L, salt = "t")
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(docs) === ids(shuffled))
  }
}
