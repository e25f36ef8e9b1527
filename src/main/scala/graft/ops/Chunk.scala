package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window chunking: split each document's token stream into
  * fixed-size windows with a configurable stride — the
  * retrieval-index / long-document-split surface (LangChain's
  * TokenTextSplitter semantics, in id space). Distinct from
  * [[Pack]]: packing CONCATENATES documents into budget bins for the
  * training loader; chunking SPLITS one document into (optionally
  * overlapping) windows that each stand alone.
  *
  * Windows start at every multiple of `stride` below the doc's token
  * count; each covers `chunkSize` tokens (the last window of a doc
  * may be shorter). `stride < chunkSize` gives overlapping RAG-style
  * chunks; `stride = chunkSize` gives a disjoint split. Zero-token
  * documents yield no chunks.
  *
  * Scale shape: the tokenizer pass and the window arithmetic are all
  * array expressions over the doc's OWN id array — `sequence` over
  * chunk starts, `slice` per chunk — inside the scan stage, with no
  * join and no shuffle beyond the caller's ordering. The per-token
  * multiplicity is chunkSize/stride (the overlap factor), paid only
  * in rows emitted, never in a wider exchange.
  */
object Chunk {

  /** (doc_id, chunk_id, cpos, token_id) rows: document `idCol`'s
    * byte-level token ids under `merges`, windowed. `cpos` is the
    * position INSIDE the chunk. */
  def tokenIdChunks(
      df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, stride: Int,
      merges: Seq[(String, String)]): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      s"chunkSize and stride must be positive (got $chunkSize, $stride)")
    chunkRows(df.select(col(idCol).as("doc_id"),
        Bpe.byteTokenIds(col(textCol), merges).as("ids")),
      chunkSize, stride)
  }

  /** Windowing over an already-materialized id-array frame
    * (doc_id, ids). */
  def chunkRows(withIds: DataFrame, chunkSize: Int, stride: Int): DataFrame =
    graft.core.Par.widen(withIds)
      .filter(size(col("ids")) > 0)
      .select(col("doc_id"), col("ids"),
        explode(sequence(lit(0), size(col("ids")) - 1, lit(stride)))
          .as("start"))
      .select(col("doc_id"),
        expr(s"CAST(start DIV $stride AS BIGINT)").as("chunk_id"),
        posexplode(slice(col("ids"), col("start") + 1, lit(chunkSize))))
      .select(col("doc_id"), col("chunk_id"),
        col("pos").cast("long").as("cpos"),
        col("col").cast("long").as("token_id"))
}
