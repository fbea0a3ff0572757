package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails,
  * IPv4 addresses, and phone-shaped digit runs, as pure codegen'd
  * Column expressions (regexp_count / regexp_replace — no UDFs).
  *
  * The patterns are deliberately restricted to syntax with identical
  * semantics in Java regex and RE2 (ASCII classes, no lookaround, no
  * backreferences) so the DuckDB oracle replays them verbatim.
  * Redaction order matters and is fixed: emails first (their local
  * part may contain digit runs), then IPv4 (dotted digit quads would
  * otherwise feed the phone pattern), then phones; the replacement
  * tokens contain no digits or '@', so passes cannot re-trigger.
  */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** Phone-shaped: optional +, then >= 9 chars of digits/space/dash
    * bracketed by digits (international and US formats; short digit
    * runs like years don't match).
    */
  val phoneRe = "\\+?[0-9][0-9 -]{7,}[0-9]"

  def emailCount(c: Column): Column = regexp_count(c, lit(emailRe))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(ipv4Re))
  def phoneCount(c: Column): Column = regexp_count(c, lit(phoneRe))

  /** All three counts as a struct (n_emails, n_ips, n_phones) —
    * counted on the raw text, before any redaction.
    */
  def counts(c: Column): Column = struct(
    emailCount(c).as("n_emails"),
    ipv4Count(c).as("n_ips"),
    phoneCount(c).as("n_phones"))

  /** Redacted text: every match replaced by a typed placeholder. */
  def redact(c: Column): Column = {
    val e = regexp_replace(c, emailRe, "<EMAIL>")
    val i = regexp_replace(e, ipv4Re, "<IP>")
    regexp_replace(i, phoneRe, "<PHONE>")
  }
}
