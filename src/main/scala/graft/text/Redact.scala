package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the scrub step every production training-data
  * pipeline runs before a corpus ships (beyond the reference, like the
  * rest of the `text` layer; the reference syncs an already-public
  * catalog and has no equivalent).
  *
  * Built from chained `regexp_replace` — codegen'd builtins, zero
  * UDFs, so redaction rides the scan like every other narrow text
  * transform (no shuffle, no materialization; at 100 TB this is
  * bandwidth-bound, exactly as it should be).
  *
  * Pattern dialect is the RE2 ∩ java.util.regex common subset
  * (character classes, bounded repetition, `\b`) so the DuckDB oracle
  * can state the IDENTICAL patterns — the gate proves both engines
  * redact byte-identically, which is the actual contract a corpus
  * pipeline needs (a dialect-divergent regex silently yields a
  * different corpus).
  *
  * Order matters and is part of the contract: emails first (their
  * local part may contain digit runs a later rule would mangle), then
  * IPv4 (dotted quads are NOT phone-shaped once removed), then phone
  * numbers (the loosest pattern, runs last so it can only see what the
  * stricter rules left behind).
  */
object Redact {

  /** `local@domain.tld` — conservative RFC-ish subset. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings like `1.2.3.4.5`
    * still redact their quad prefix identically in both engines. */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** International-ish phone: optional `+`, then ≥8 chars of digits /
    * separators, digit-terminated. Loose by design — recall over
    * precision is the right default for a scrub step. */
  val PhonePattern = "\\+?[0-9][0-9() -]{6,}[0-9]"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Redact all three PII classes, in contract order. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** Per-class match counts on the UNredacted text (audit columns —
    * a scrub job reports what it removed). */
  def piiCounts(c: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(c, lit(EmailPattern)),
    "n_ips" -> regexp_count(c, lit(Ipv4Pattern)),
    "n_phones" -> regexp_count(c, lit(PhonePattern)))
}
