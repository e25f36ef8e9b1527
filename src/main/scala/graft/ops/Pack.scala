package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context packing: assign documents to fixed-token-budget training
  * sequences ("packs"). Docs are laid out in a deterministic
  * md5-shuffled order (so packs mix sources instead of preserving
  * ingest order) and cut into budget-B bins by exclusive prefix sum:
  * a doc belongs to the bin its first token falls in, so a bin can
  * overflow by at most one doc's tail — the streaming-packer
  * semantics every pretraining loader uses, made deterministic and
  * replayable.
  *
  * Scale shape: packing is a running sum, which is inherently
  * sequential — so the order is defined WITHIN hash shards, one
  * window partition each. Shards scale the sequential bottleneck
  * out (each is an independent task at any corpus size); the only
  * shuffle is the one window exchange on the shard key. All
  * pseudo-randomness is md5 ([[graft.functions.HashParity]]), so the
  * layout replays bit-for-bit in the DuckDB oracle and across
  * re-runs at any partitioning.
  */
object Pack {

  /** Whitespace token count — the default budget currency; swap in
    * [[Bpe.tokenCount]] for vocab-faithful budgets. */
  def whitespaceTokens(c: Column): Column =
    size(TextAnalysis.tokens(c)).cast("long")

  /** Per-pack summary: (shard, pack_id) with doc count, token total,
    * and the first doc in layout order. `budget` is the context
    * length in tokens; `nShards` bounds the per-task sequential
    * chain — size it to (corpus tokens / executor-task throughput),
    * not to the cluster (packs never span shards). `tokensOf` is the
    * budget currency (whitespace words by default; pass a
    * [[Bpe]]-vocab counter for tokenizer-faithful packing). */
  def packSummary(
      df: DataFrame, textCol: String, idCol: String,
      budget: Long = 512L, nShards: Int = 8,
      tokensOf: Column => Column = whitespaceTokens): DataFrame =
    summarize(assignPacks(df, textCol, idCol, budget, nShards, tokensOf),
      idCol = "id")

  /** [[packSummary]] from an ALREADY-COMPUTED token-count column (the
    * [[assignPacksOn]] counterpart) — for callers whose per-doc token
    * counts exist upstream (e.g. a budget-selected frame) and must
    * not be re-tokenized. */
  def packSummaryOn(df: DataFrame, idCol: String, toks: Column,
      budget: Long, nShards: Int): DataFrame =
    summarize(assignPacksOn(df, idCol, toks, budget, nShards), idCol)

  /** The manifest shape, defined once: (shard, pack_id) with doc
    * count, token total, and the first doc in layout order. */
  private[graft] def summarize(perDoc: DataFrame, idCol: String): DataFrame =
    perDoc.groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("pack_tokens"),
        min(col(idCol)).as("first_doc"))
      .orderBy(col("shard"), col("pack_id"))

  /** Per-doc pack assignment: (id, toks, shard, pack_id). */
  def assignPacks(
      df: DataFrame, textCol: String, idCol: String,
      budget: Long, nShards: Int,
      tokensOf: Column => Column = whitespaceTokens): DataFrame =
    assignPacksOn(
      df.select(col(idCol).as("id"), tokensOf(col(textCol)).as("toks")),
      "id", col("toks"), budget, nShards)
      .select(col("id"), col("toks"), col("shard"), col("pack_id"))

  /** DOCUMENT-INTEGRITY (no-span) packing: same md5 layout, but a doc
    * that would cross the budget boundary STARTS A NEW PACK instead
    * of spanning — the loader mode when sequences must not fragment
    * documents (instruction tuning, long-context curricula). Every
    * multi-doc pack's token total is <= budget by construction; an
    * oversized single doc sits alone in its own pack.
    *
    * The greedy first-fit walk is inherently sequential (each pack
    * boundary depends on everything before it), so it runs as ONE
    * ordered pass per shard inside `mapPartitions` — the same
    * justified-sequential contract as the span-packing window, with
    * shards bounding the sequential chain. Deterministic at any input
    * partitioning: rows are hash-repartitioned BY shard and sorted
    * (shard, k, id) before the walk. */
  def assignPacksNoSpan(df: DataFrame, idCol: String, toks: Column,
      budget: Long, nShards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    // "toks" is the one legitimate overwrite — defined here as the
    // given expression, exactly as in assignPacksOn
    val clash = df.columns.toSet.intersect(Set("k", "shard", "pack_id"))
    require(clash.isEmpty,
      s"assignPacksNoSpan would overwrite caller column(s) ${clash.mkString(", ")}")
    val s = df.sparkSession
    import s.implicits._
    val base = df
      .withColumn("toks", toks)
      .withColumn("k", md5(col(idCol).cast("string")))
      .withColumn("shard",
        conv(substring(col("k"), 1, 7), 16, 10).cast("long") % nShards)
      .select(col(idCol).cast("long").as("id"), col("toks"),
        col("k"), col("shard"))
      .as[(Long, Long, String, Long)]
    base.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("k"), col("id"))
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var pack = 0L
        var filled = 0L
        it.map { case (id, t, _, shard) =>
          if (shard != curShard) { curShard = shard; pack = 0L; filled = t }
          else if (filled + t <= budget) { filled += t }
          else { pack += 1L; filled = t }
          (id, t, shard, pack)
        }
      }
      .toDF("id", "toks", "shard", "pack_id")
  }

  /** [[summarize]] over the no-span assignment. */
  def packSummaryNoSpan(df: DataFrame, textCol: String, idCol: String,
      budget: Long = 512L, nShards: Int = 8,
      tokensOf: Column => Column = whitespaceTokens): DataFrame =
    summarize(assignPacksNoSpan(
      df.select(col(idCol).as("id"), tokensOf(col(textCol)).as("toks")),
      "id", col("toks"), budget, nShards), idCol = "id")

  /** Pack assignment from an ALREADY-COMPUTED token-count column,
    * keeping the caller's other columns (and the layout key `k`) —
    * for callers that materialize per-doc token structures anyway
    * (e.g. id streams budget by `size(ids)`) and must not pay the
    * tokenizer twice. Adds (toks, k, shard, pack_id). */
  def assignPacksOn(df: DataFrame, idCol: String, toks: Column,
      budget: Long, nShards: Int): DataFrame = {
    // the layout columns would silently clobber same-named caller
    // columns ("toks" is the one legitimate overwrite: it is DEFINED
    // here as the given expression)
    val clash = df.columns.toSet.intersect(Set("k", "shard", "pack_id"))
    require(clash.isEmpty,
      s"assignPacksOn would overwrite caller column(s) ${clash.mkString(", ")}")
    val base = df
      .withColumn("toks", toks)
      .withColumn("k", md5(col(idCol).cast("string")))
      .withColumn("shard",
        conv(substring(col("k"), 1, 7), 16, 10).cast("long") % nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col("k"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("excl", coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("excl") / budget).cast("long"))
      .drop("excl")
  }
}
