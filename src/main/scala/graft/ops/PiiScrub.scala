package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrub every production
  * training-data pipeline runs before release (the email/phone/IP
  * taggers documented for public corpora, e.g. Dolma, Soldaini et
  * al. 2024 §2; C4's descendants apply the same class of regex
  * scrubbers). Extends [[Scrub]]'s email/IPv4 pair (reused verbatim
  * — one pattern definition per shape in this codebase) with the
  * SSN and phone shapes and a per-document summary. Four detectors,
  * applied in a FIXED order so later patterns can never re-match
  * inside an earlier redaction:
  *
  *   1. email     → `<EMAIL>`
  *   2. IPv4      → `<IP>`
  *   3. SSN-shape → `<ID>`   (ddd-dd-dddd)
  *   4. phone     → `<PHONE>` (optional +country, separated groups)
  *
  * Counts are taken on each stage's INPUT (so an IP never counts
  * again as a phone), redaction replaces every occurrence. All four
  * stages are per-row `regexp_count`/`regexp_replace` expressions in
  * the scan stage — no shuffle, no UDF, embarrassingly parallel at
  * any corpus size. The patterns avoid lookaround and backreferences
  * so they evaluate identically under Java regex (Spark) and RE2
  * (the DuckDB oracle).
  */
object PiiScrub {

  val EmailRe: String = Scrub.EmailPattern
  val Ipv4Re: String = Scrub.Ipv4Pattern
  val SsnRe: String = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Optional +country prefix, then 3-3-4 digit groups with
    * space/dot/dash separators — the separated-group shape; a bare
    * digit run inside prose stays untouched. EVERY alternative is
    * left-anchored so the match can never start mid-digit-run: the
    * bare shape behind `\b`, the +country behind the literal `+`,
    * and the paren shape behind `(^|[^0-9])` — a serial like
    * `1(234) 567-8901` no longer matches from its paren (the last
    * residual of this defect class). The paren-shape prefix char is
    * CAPTURED (the pattern's only group) and restored by the
    * replacement (`$1` under Java, `\1` under RE2; an unmatched
    * group substitutes '' in both engines). The paren shape requires
    * its close paren, so the bare `\b` alternative cannot swallow a
    * stray `)` via an optional-paren suffix. Lookaround-free, so
    * Java regex (Spark) and RE2 (DuckDB) agree. */
  val PhoneRe: String =
    "(?:(^|[^0-9])\\([0-9]{3}\\)|\\+[0-9]{1,3}[ .-]\\(?[0-9]{3}\\)?|\\b[0-9]{3})" +
      "[ .-][0-9]{3}[ .-][0-9]{4}\\b"

  /** One detector stage: pattern, redaction token, count column, and
    * whether the pattern captures a one-char left-context prefix the
    * replacement must restore. */
  final case class Stage(re: String, placeholder: String, countCol: String,
      prefixGroup: Boolean = false) {
    /** Replacement for Spark's `regexp_replace` (Java regex). */
    def sparkRepl: String = if (prefixGroup) "$1" + placeholder else placeholder
    /** Replacement for DuckDB's `regexp_replace` (RE2). */
    def duckRepl: String = if (prefixGroup) "\\1" + placeholder else placeholder
  }

  /** The ordered detector stages. */
  val Stages: Seq[Stage] = Seq(
    Stage(EmailRe, "<EMAIL>", "n_emails"),
    Stage(Ipv4Re, "<IP>", "n_ips"),
    Stage(SsnRe, "<ID>", "n_ids"),
    Stage(PhoneRe, "<PHONE>", "n_phones", prefixGroup = true))

  /** Per-document PII report: the four counts, the total, the
    * redacted text, and `has_pii`. Null text scrubs as ''. */
  def report(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    var t: Column = coalesce(col(textCol), lit(""))
    val counts = Stages.map { st =>
      val n = regexp_count(t, lit(st.re)).cast("long").as(st.countCol)
      t = regexp_replace(t, st.re, st.sparkRepl)
      n
    }
    df.select(
        (col(idCol).as("id") +: counts) :+ t.as("clean_text"): _*)
      .withColumn("n_pii",
        Stages.map(st => col(st.countCol)).reduce(_ + _))
      .withColumn("has_pii", (col("n_pii") > 0L).cast("long"))
  }
}
