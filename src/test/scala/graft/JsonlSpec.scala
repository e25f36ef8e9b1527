package graft

import org.apache.spark.sql.functions._
import graft.sources.JsonlCorpus

/** Gzipped-JSONL shard ingest: corrupt-line routing and
  * generator-side recomputation of the per-source stats. */
class JsonlSpec extends SparkSpec {

  test("q_jsonl_gz: corrupt group counts exactly one line per shard") {
    val rows = graft.queries.MiscQueries.qJsonlGz(spark, sf).collect()
    val bySource = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(bySource("_corrupt") ===
      ((JsonlCorpus.NumShards.toLong, 0L, 0L, 0L)))
    // recompute the clean side from the generator's own functions
    val ids = for {
      s <- 0 until JsonlCorpus.NumShards
      i <- 0 until JsonlCorpus.DocsPerShard
      if i != JsonlCorpus.DocsPerShard / 2
    } yield JsonlCorpus.docId(s, i)
    val want = ids.groupBy(JsonlCorpus.source).map { case (src, g) =>
      src -> ((g.size.toLong,
        g.map(id => JsonlCorpus.text(id).split(" ").length.toLong).sum,
        g.map(JsonlCorpus.stars).sum,
        g.map(JsonlCorpus.lang).distinct.size.toLong))
    }
    want.foreach { case (src, w) => assert(bySource(src) === w, src) }
    assert(rows.length === want.size + 1)
  }

  test("explicit schema: no inference job, nested meta extracted") {
    import org.apache.spark.sql.types._
    val jdir = JsonlCorpus.ensure()
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("meta", StructType(Seq(StructField("lang", StringType))))))
    val df = spark.read.schema(schema).json(s"$jdir/*.jsonl.gz")
    assert(df.schema === schema) // schema taken verbatim, not inferred
    val en = df.filter(col("meta.lang") === "en").count()
    assert(en > 0)
  }
}

/** Histogram-quantile scale path: the approximate upper edge must
  * cover the exact quantile and stay within one bin width of it. */
class HistQuantileSpec extends SparkSpec {
  test("q_quantiles_hist: hi >= exact and hi - exact < bin width") {
    val rows = graft.queries.MiscQueries.qQuantilesHist(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq((2, 5), (3, 6), (4, 7)).foreach { case (hi, ex) =>
        val (h, e) = (r.getLong(hi), r.getLong(ex))
        assert(h >= e, s"${r.getString(0)}: approx $h below exact $e")
        assert(h - e < 256L, s"${r.getString(0)}: error ${h - e} >= bin width")
      }
    }
  }
}
