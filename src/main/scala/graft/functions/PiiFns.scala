package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction over text columns — the scrub stage every
  * large-scale training-data pipeline runs before anything else touches
  * the corpus. All native column expressions (`regexp_count` /
  * `regexp_replace` are codegen'd), no UDFs, so the scrub stays inside
  * whole-stage codegen on a 100 TB scan and the patterns push through
  * unchanged to any engine that speaks RE2/Java-regex common syntax
  * (the oracle replays them verbatim in DuckDB).
  *
  * Patterns deliberately stay inside the RE2 ∩ java.util.regex common
  * subset (character classes, bounded repetition, `\b`) so Spark and
  * the DuckDB oracle compile them identically — no lookbehind, no
  * backreferences.
  */
object PiiFns {

  /** RFC-5322-lite email shape: local part, @, dotted domain, TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — no 0-255 range check, matching the
    * scrub-recall-over-precision stance of corpus pipelines).
    */
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** NANP-style short phone: NXX-XXXX with word boundaries. */
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Count of matches of one PII class. */
  def piiCount(c: Column, re: String): Column = regexp_count(c, lit(re)).cast("long")

  /** Replace every PII span with a typed placeholder. Email runs first
    * (its local part may contain digits a later pattern could nibble),
    * then IPv4 (dotted digits), then phone — each pass sees the
    * previous pass's placeholders, never raw overlapping spans.
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
