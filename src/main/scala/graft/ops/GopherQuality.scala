package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The full Gopher document-quality rule set (Rae et al. 2021,
  * "Scaling Language Models", Appendix A1.1) — the standard web-corpus
  * quality gate, applied per document:
  *
  *   1. word count within [minWords, maxWords]
  *   2. mean word length within [minMeanLen, maxMeanLen]
  *   3. symbol-to-word ratio at most maxSymbolRatio for '#' and for
  *      '...' SEPARATELY (the paper thresholds each symbol's ratio
  *      on its own — 0.06 hash + 0.06 ellipsis passes, where a
  *      pooled 0.12 would wrongly fail)
  *   4. at least minAlphaFrac of words contain an alphabetic character
  *   5. at least minStopwords DISTINCT members of the published
  *      8-word stopword list present
  *   6. at most maxBulletFrac of lines starting with a bullet
  *   7. at most maxEllipsisFrac of lines ending with an ellipsis
  *
  * Complementary to [[TextAnalysis.repetitionReport]] (Gopher's
  * repetition rules, same paper §A1.1) — together they are the whole
  * published filter.
  *
  * Every rule evaluates as an INTEGER cross-multiplication
  * (`10 * n_symbols <= n_words` instead of `n_symbols / n_words <=
  * 0.1`), so the keep decision replays bit-exactly in any engine; the
  * reported ratio columns are single IEEE long/long divisions (the
  * one float form whose cross-engine hash is stable). All metrics are
  * per-row expressions inside the scan stage — no shuffle, no UDF,
  * embarrassingly parallel at any corpus size.
  */
object GopherQuality {

  /** The published stopword rule list (Rae et al. 2021 A1.1: "the,
    * be, to, of, and, that, have, with"). */
  val RuleStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The keep decision alone, as a single per-row Column over the
    * text — for composed pipelines (funnel, selection) that need the
    * gate but not the report: inlining this into the caller's one
    * corpus pass costs nothing, where joining [[report]]'s frame
    * back on id would pay a second scan and a shuffle. */
  def keepColumn(
      text: Column,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanLen: Long = 3, maxMeanLen: Long = 10,
      maxSymbolRatio: (Long, Long) = (1, 10),
      minAlphaFrac: (Long, Long) = (4, 5),
      minStopwords: Long = 2,
      maxBulletFrac: (Long, Long) = (9, 10),
      maxEllipsisFrac: (Long, Long) = (3, 10)): Column =
    flagColumns(text, minWords, maxWords, minMeanLen, maxMeanLen,
      maxSymbolRatio, minAlphaFrac, minStopwords, maxBulletFrac,
      maxEllipsisFrac).last._2

  /** Per-document metrics + per-rule flags + the conjunction `keep`.
    *
    * Ratio thresholds are taken as exact rationals `num/den` so the
    * comparisons stay in integer arithmetic: `maxSymbolRatio = (1,
    * 10)` means "at most 1/10th". Defaults are the published Gopher
    * values.
    */
  def report(
      df: DataFrame, textCol: String, idCol: String,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanLen: Long = 3, maxMeanLen: Long = 10,
      maxSymbolRatio: (Long, Long) = (1, 10),
      minAlphaFrac: (Long, Long) = (4, 5),
      minStopwords: Long = 2,
      maxBulletFrac: (Long, Long) = (9, 10),
      maxEllipsisFrac: (Long, Long) = (3, 10)): DataFrame = {
    val cols = flagColumns(col(textCol), minWords, maxWords, minMeanLen,
      maxMeanLen, maxSymbolRatio, minAlphaFrac, minStopwords,
      maxBulletFrac, maxEllipsisFrac)
    df.select(col(idCol).as("id") +: cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** The metric and flag expressions, in output order ending with
    * `keep` — shared by [[report]] and [[keepColumn]]. */
  private def flagColumns(
      text: Column,
      minWords: Long, maxWords: Long,
      minMeanLen: Long, maxMeanLen: Long,
      maxSymbolRatio: (Long, Long),
      minAlphaFrac: (Long, Long),
      minStopwords: Long,
      maxBulletFrac: (Long, Long),
      maxEllipsisFrac: (Long, Long)): Seq[(String, Column)] = {
    val w = split(text, " ")
    val lines = split(text, "\n")
    // counts: all integer, all per-row
    val nWords = size(w).cast("long")
    val wordChars = length(regexp_replace(text, " ", "")).cast("long")
    val nHash =
      (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    // non-overlapping "..." occurrences, exactly replace-semantics in
    // both engines: every 3 removed chars is one ellipsis
    val nEllipsis = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)).cast("long")
    val nAlphaWords =
      size(filter(w, t => t.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(
      array(RuleStopwords.map(lit): _*),
      sw => array_contains(w, sw))).cast("long")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines,
      l => l.startsWith("-") || l.startsWith("•"))).cast("long")
    val nEllEnd = size(filter(lines, l => l.endsWith("..."))).cast("long")

    def flag(c: Column): Column = c.cast("long")
    val rWords = flag(nWords >= minWords && nWords <= maxWords)
    val rMeanLen = flag(
      wordChars >= lit(minMeanLen) * nWords &&
        wordChars <= lit(maxMeanLen) * nWords)
    // each symbol's ratio tested against the threshold on its own
    val rSymbol = flag(
      lit(maxSymbolRatio._2) * nHash <= lit(maxSymbolRatio._1) * nWords &&
        lit(maxSymbolRatio._2) * nEllipsis <=
          lit(maxSymbolRatio._1) * nWords)
    val rAlpha = flag(
      lit(minAlphaFrac._2) * nAlphaWords >= lit(minAlphaFrac._1) * nWords)
    val rStop = flag(nStop >= minStopwords)
    val rBullet = flag(
      lit(maxBulletFrac._2) * nBullet <= lit(maxBulletFrac._1) * nLines)
    val rEllipsis = flag(
      lit(maxEllipsisFrac._2) * nEllEnd <= lit(maxEllipsisFrac._1) * nLines)

    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> (wordChars / nWords),
      "symbol_ratio" -> ((nHash + nEllipsis) / nWords),
      "alpha_word_frac" -> (nAlphaWords / nWords),
      "n_rule_stopwords" -> nStop,
      "rule_words" -> rWords,
      "rule_mean_len" -> rMeanLen,
      "rule_symbol" -> rSymbol,
      "rule_alpha" -> rAlpha,
      "rule_stopwords" -> rStop,
      "rule_bullet" -> rBullet,
      "rule_ellipsis" -> rEllipsis,
      "keep" -> (rWords * rMeanLen * rSymbol * rAlpha * rStop * rBullet
        * rEllipsis))
  }
}
