package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.CacheScope.Scoped

/** The staged filter-funnel: per-stage attrition accounting (docs and
  * tokens surviving each successive curation gate) — the artifact
  * every curation run ships with. Stages:
  *
  *   0 total → 1 language gate → 2 Gopher quality keep →
  *   3 non-repetitive → 4 exact first-wins dedup
  *
  * Shared by the batch entry (`q_filter_funnel`) and the streaming
  * drain ([[graft.streaming.FunnelStream]]), which differ only in
  * stage 4's scope: the batch report dedups within the frame, the
  * stream dedups against everything admitted before the batch.
  *
  * Scale shape: all per-doc flags land in ONE corpus pass (the Gopher
  * gate is a scan-stage expression; repetition adds its slim bigram
  * aggregate, computed over the language-gated subset only since the
  * flag is consumed behind that gate); every stage count is a
  * conditional sum over the cached flag frame — the corpus is never
  * re-filtered per stage.
  */
object Funnel {

  /** Per-doc funnel flags, one corpus pass:
    * (id, fp, n_words, f1, f2, f3) where fN = "survives stage N". */
  def flags(
      df: DataFrame, textCol: String, idCol: String, langCol: String,
      lang: String = "en", minStopwords: Long = 1,
      repFlagAt: Double = 0.1): DataFrame = {
    val rep = TextAnalysis.repetitionReport(
        df.filter(col(langCol) === lang), textCol, idCol, flagAt = repFlagAt)
      .select(col("id"), col("repetitive"))
    df.select(col(idCol).as("id"), col(langCol).as("lang"),
        md5(col(textCol)).as("fp"),
        size(split(col(textCol), " ")).cast("long").as("n_words"),
        GopherQuality.keepColumn(col(textCol), minStopwords = minStopwords)
          .as("gopher"))
      .join(rep, Seq("id"), "left")
      .withColumn("f1", (col("lang") === lang).cast("long"))
      .withColumn("f2", col("f1") * col("gopher"))
      .withColumn("f3",
        col("f2") * (lit(1L) - coalesce(col("repetitive"), lit(0L))))
      .select("id", "fp", "n_words", "f1", "f2", "f3")
  }

  /** Stage-3 survivors deduped first-wins WITHIN the flag frame
    * (lowest id per fingerprint). An argmin AGGREGATE — `id` is
    * unique, so min(struct(id, ...)) IS the old window's first row —
    * which partial-combines map-side: each task ships one survivor
    * candidate per fingerprint instead of exchanging and sorting
    * every stage-3 row under a row_number window. */
  def uniqueWithin(flagFrame: DataFrame): DataFrame =
    flagFrame.filter(col("f3") === 1)
      .groupBy(col("fp"))
      .agg(min(struct(col("id"), col("n_words"), col("f1"), col("f2"),
        col("f3"))).as("b"))
      .select(col("b.id").as("id"), col("fp"), col("b.n_words").as("n_words"),
        col("b.f1").as("f1"), col("b.f2").as("f2"), col("b.f3").as("f3"))

  /** The 5-row funnel from the flag frame and the stage-4 survivor
    * rows (which must carry `n_words`). */
  def stageSummary(flagFrame: DataFrame, unique: DataFrame): DataFrame = {
    def zero(c: org.apache.spark.sql.Column) = coalesce(c, lit(0L))
    val a = flagFrame.agg(
      count(lit(1)).as("d0"), zero(sum(col("n_words"))).as("t0"),
      zero(sum(col("f1"))).as("d1"),
      zero(sum(col("f1") * col("n_words"))).as("t1"),
      zero(sum(col("f2"))).as("d2"),
      zero(sum(col("f2") * col("n_words"))).as("t2"),
      zero(sum(col("f3"))).as("d3"),
      zero(sum(col("f3") * col("n_words"))).as("t3"))
    val a4 = unique.agg(
      count(lit(1)).as("d4"), zero(sum(col("n_words"))).as("t4"))
    a.crossJoin(a4).selectExpr(
      """stack(5,
        |  CAST(0 AS BIGINT), 'total', d0, t0,
        |  CAST(1 AS BIGINT), 'lang_en', d1, t1,
        |  CAST(2 AS BIGINT), 'gopher', d2, t2,
        |  CAST(3 AS BIGINT), 'non_repetitive', d3, t3,
        |  CAST(4 AS BIGINT), 'unique', d4, t4)
        |AS (stage_idx, stage, n_docs, n_tokens)""".stripMargin)
      .orderBy(col("stage_idx"))
  }

  /** Batch funnel report over one frame. */
  def report(
      df: DataFrame, textCol: String, idCol: String, langCol: String,
      lang: String = "en", minStopwords: Long = 1,
      repFlagAt: Double = 0.1): DataFrame = {
    val f = flags(df, textCol, idCol, langCol, lang, minStopwords,
      repFlagAt).scopedCache()
    stageSummary(f, uniqueWithin(f))
  }
}
