package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization + PII scrubbing for corpus curation: collapse
  * whitespace, trim, lowercase; redact email addresses and IPv4
  * literals with typed placeholder tokens and count what was
  * redacted (the audit trail a compliance pass needs).
  *
  * Pure per-row expressions — codegen'd, no shuffle, no UDF. The
  * regexes stay inside the RE2-compatible subset (no lookarounds, no
  * backrefs) so the DuckDB oracle replays them exactly; Spark's Java
  * regex engine and RE2 agree on this class of pattern.
  */
object Scrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Whitespace-collapse + trim + lowercase. */
  def cleanText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Redact emails first (they contain dot-runs an IPv4 pattern could
    * nibble), then IPv4 literals. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "<EMAIL>"),
      Ipv4Pattern, "<IP>")

  def emailCount(c: Column): Column =
    regexp_count(c, lit(EmailPattern)).cast("long")

  def ipv4Count(c: Column): Column =
    regexp_count(c, lit(Ipv4Pattern)).cast("long")
}
