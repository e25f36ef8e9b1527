package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning rule set (Raffel et al. 2020, §2.2 — the filters
  * that built the "Colossal Clean Crawled Corpus"), per document:
  *
  * Line level (lines split on '\n', trimmed):
  *   - retain only lines ending in a terminal punctuation mark
  *     (. ! ? ")
  *   - drop lines with fewer than `minLineWords` words (paper: 5 —
  *     "only retained lines that contained at least 5 words")
  *   - drop lines containing the word "javascript" (case-insensitive)
  *
  * Page level (the whole doc):
  *   - drop pages with fewer than `minKeptLines` retained lines
  *     (paper: 3 — "discarded any page with fewer than 3 sentences")
  *   - drop pages containing "lorem ipsum" (case-insensitive)
  *   - drop pages containing a curly brace '{' (code)
  *   - drop pages containing any word from a blocklist
  *     (case-insensitive word match; the paper uses a public
  *     "bad words" list — parameterized here)
  *
  * Output: the cleaned text (kept lines rejoined with '\n') plus the
  * per-rule counts/flags and the page-level keep decision. Every rule
  * is a per-row expression over the line array — scan-stage only, no
  * shuffle, no UDF; the cleaned text and flags replay exactly in any
  * engine with list/regex semantics (trim + anchor regex + substring
  * search).
  */
object C4Filter {

  /** Per-line retention predicate over a TRIMMED line. */
  private def lineKeep(l: Column, minLineWords: Int): Column =
    l.rlike("[.!?\"]$") &&
      size(split(l, " ")) >= minLineWords &&
      !contains(lower(l), lit("javascript"))

  /** Per-document C4 report: cleaned text, line accounting, page
    * flags, keep. */
  def report(
      df: DataFrame, textCol: String, idCol: String,
      minLineWords: Int = 5, minKeptLines: Int = 3,
      blocklist: Seq[String] = Seq.empty): DataFrame = {
    val text = col(textCol)
    // trim both spaces and \r: CRLF text would otherwise leave a
    // carriage return on every line, where Java's '$' matches before
    // it but RE2's (the oracle engine) does not — the one spot the
    // two regex dialects would diverge
    val lines = transform(split(text, "\n"), l => trim(l, " \r"))
    val kept = filter(lines, l => lineKeep(l, minLineWords))
    val lowText = lower(text)
    val nKept = size(kept).cast("long")
    val hasLorem = contains(lowText, lit("lorem ipsum"))
    val hasBrace = contains(text, lit("{"))
    val words = split(lowText, "[ \n\r]")
    val hasBad =
      if (blocklist.isEmpty) lit(false)
      else blocklist.map(b => array_contains(words, b.toLowerCase))
        .reduce(_ || _)
    df.select(
      col(idCol).as("id"),
      array_join(kept, "\n").as("clean_text"),
      size(lines).cast("long").as("n_lines"),
      nKept.as("n_kept_lines"),
      hasLorem.cast("long").as("has_lorem"),
      hasBrace.cast("long").as("has_brace"),
      hasBad.cast("long").as("has_badword"),
      (nKept >= minKeptLines && !hasLorem && !hasBrace && !hasBad)
        .cast("long").as("keep"))
  }
}
