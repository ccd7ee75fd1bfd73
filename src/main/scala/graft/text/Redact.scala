package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII pattern redaction — emails, IPv4 addresses, URLs — the standard
  * scrubbing pass a training-data pipeline runs before publishing a
  * corpus. Regex-level redaction is the industry baseline (the
  * C4/RefinedWeb recipes); anything smarter (NER) sits on top of the
  * same column plumbing.
  *
  * Scale shape: per-row scalar regex work — MAP-ONLY, no shuffle,
  * whole-stage codegen'd (Spark's `regexp_replace`/`regexp_extract_all`
  * compile the pattern once per task via the commons pattern cache).
  * The patterns use only syntax with identical semantics in Java regex
  * and RE2 (character classes, bounded repetition, `\b`, `\d`, `\s`),
  * so the DuckDB oracle mirrors byte-for-byte.
  *
  * Redaction ORDER is part of the contract: URL first (a URL may embed
  * an email-shaped userinfo or dotted-quad host; once the URL is
  * collapsed to its token the inner patterns can't double-fire), then
  * email, then IPv4.
  */
object Redact {

  /** RFC-5322-lite mailbox; the pragmatic form every scrubber uses. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted quad, word-bounded so version strings like 1.2.3.4.5 still
    * match only a 4-group prefix window, same as RE2. */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Scheme-anchored, greedy to the next whitespace. */
  val UrlPattern = "https?://[^\\s]+"

  val UrlToken = "<URL>"
  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"

  /** Text with URLs, then emails, then IPv4s replaced by tokens. */
  def redactText(c: Column): Column = {
    val noUrl = regexp_replace(c, UrlPattern, UrlToken)
    val noEmail = regexp_replace(noUrl, EmailPattern, EmailToken)
    regexp_replace(noEmail, Ipv4Pattern, IpToken)
  }

  /** Per-pattern match counts over the SAME staged text the redaction
    * sees (URL counted on the input; email counted after URL removal;
    * IP counted after URL+email removal) — so counts always equal the
    * number of tokens the redacted text carries.
    */
  def piiCounts(c: Column): Seq[(String, Column)] = {
    val noUrl = regexp_replace(c, UrlPattern, UrlToken)
    val noEmail = regexp_replace(noUrl, EmailPattern, EmailToken)
    Seq(
      "n_url" -> size(regexp_extract_all(c, lit(UrlPattern), lit(0))).cast("long"),
      "n_email" -> size(regexp_extract_all(noUrl, lit(EmailPattern), lit(0))).cast("long"),
      "n_ip" -> size(regexp_extract_all(noEmail, lit(Ipv4Pattern), lit(0))).cast("long"))
  }
}
