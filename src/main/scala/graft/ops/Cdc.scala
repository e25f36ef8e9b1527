package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HashParity

/** Content-defined chunking (Muthitacharoen et al. 2001, LBFS; the
  * rolling-boundary family FastCDC refines): split each document into
  * chunks at CONTENT-derived positions — a token ends a chunk when
  * its hash clears a divisor test — so an insertion or deletion only
  * moves the boundaries of its own neighborhood, and every untouched
  * chunk keeps its identity across document versions. Chunk-hash
  * equality then deduplicates at STORAGE granularity: re-crawled or
  * lightly-edited documents share most chunks, which neither
  * doc-level fingerprints (MinHash/SimHash/winnowing flag the PAIR)
  * nor line dedup (fixed structural unit) expose.
  *
  * Determinism and oracle parity: the boundary test is
  * `h28(token) % divisor == 0` ([[HashParity.h28]] — md5, the one
  * hash both engines share), the chunk index is an exclusive running
  * sum of boundary flags, and the chunk identity is `md5` of the
  * space-joined chunk tokens — every step replays in DuckDB with the
  * same window frame and list ordering.
  *
  * Scale shape: one token explode, one per-doc running-sum window
  * (partition by doc id — no cross-doc shuffle beyond the id hash),
  * one (id, chunk) aggregate, and the cross-doc sharing statistic is
  * an aggregate + equi-join on chunk hash — bounded keys, never
  * all-pairs. Expected chunk length is `divisor` tokens.
  */
object Cdc {

  /** One row per chunk: (id, chunk_idx, chunk_hash, n_toks). */
  def chunks(
      df: DataFrame, textCol: String, idCol: String,
      divisor: Int = 16): DataFrame = {
    require(divisor >= 1, "divisor must be >= 1")
    val toks = graft.core.Par.widen(df)
      .select(col(idCol).as("id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("p", "tok")))
      .withColumn("flag",
        (pmod(HashParity.h28(col("tok")), lit(divisor.toLong)) === 0L)
          .cast("long"))
    // exclusive running boundary count: the boundary token itself
    // still belongs to the chunk it ends
    val cum = Window.partitionBy(col("id")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    toks
      .withColumn("chunk_idx",
        coalesce(sum(col("flag")).over(cum), lit(0L)))
      .groupBy(col("id"), col("chunk_idx"))
      .agg(
        md5(array_join(
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_hash"),
        count(lit(1)).as("n_toks"))
  }

  /** Per-document sharing report: (doc_id, n_chunks, n_shared_chunks,
    * shared_ppm) where a chunk is SHARED when its hash occurs in more
    * than one document — the storage-dedup signal (how much of this
    * doc is redundant against the rest of the corpus). */
  def report(
      df: DataFrame, textCol: String, idCol: String,
      divisor: Int = 16): DataFrame = {
    val ch = graft.core.CacheScope.cache(
      chunks(df, textCol, idCol, divisor))
    val docsPerHash = ch.groupBy(col("chunk_hash"))
      .agg(count_distinct(col("id")).as("n_docs"))
    ch.join(docsPerHash, Seq("chunk_hash"))
      .groupBy(col("id").as("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum((col("n_docs") > 1L).cast("long")).as("n_shared_chunks"))
      .withColumn("shared_ppm",
        expr("n_shared_chunks * 1000000 DIV n_chunks"))
  }
}
