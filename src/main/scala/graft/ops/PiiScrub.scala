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
    * digit run inside prose stays untouched. The left edge is
    * anchored per alternative (`\+country`, `(`, or `\b` before the
    * bare digit group) so the match can never start mid-digit-run —
    * without it a longer serial like `1234-567-8901` would match from
    * its second digit, inflating `n_phones` and stranding the leading
    * digit next to the redaction. Lookaround-free, so Java regex
    * (Spark) and RE2 (DuckDB) agree. */
  val PhoneRe: String =
    "(?:\\+[0-9]{1,3}[ .-]\\(?|\\(|\\b)[0-9]{3}\\)?[ .-][0-9]{3}[ .-][0-9]{4}\\b"

  /** The ordered (pattern, placeholder, count column) stages. */
  val Stages: Seq[(String, String, String)] = Seq(
    (EmailRe, "<EMAIL>", "n_emails"),
    (Ipv4Re, "<IP>", "n_ips"),
    (SsnRe, "<ID>", "n_ids"),
    (PhoneRe, "<PHONE>", "n_phones"))

  /** Per-document PII report: the four counts, the total, the
    * redacted text, and `has_pii`. Null text scrubs as ''. */
  def report(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    var t: Column = coalesce(col(textCol), lit(""))
    val counts = Stages.map { case (re, placeholder, name) =>
      val n = regexp_count(t, lit(re)).cast("long").as(name)
      t = regexp_replace(t, re, placeholder)
      n
    }
    df.select(
        (col(idCol).as("id") +: counts) :+ t.as("clean_text"): _*)
      .withColumn("n_pii",
        Stages.map { case (_, _, n) => col(n) }.reduce(_ + _))
      .withColumn("has_pii", (col("n_pii") > 0L).cast("long"))
  }
}
