package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing primitives — email / phone / IPv4 → typed placeholder
  * tokens, the redaction pass a public-web training corpus runs before
  * anything downstream sees the text (q151 pins the exact byte-level
  * output against DuckDB).
  *
  * The patterns stay inside the RE2 subset (no backreferences, no
  * lookaround) so the JVM and RE2-family engines (DuckDB, Go, C++)
  * agree on what matches — the property that lets redaction output be
  * hash-compared across engines. Replacement order matters and is
  * fixed: emails first (their local part may contain digits), phones,
  * then bare IPv4s. All of it is `regexp_replace`/`regexp_count`
  * built-ins: row-local, codegen'd, zero shuffle.
  */
object Pii {

  // Recall over precision, deliberately: the IP pattern accepts invalid
  // octets (999.999.999.999) and the email local part is permissive —
  // for REDACTION a false positive costs a few bytes of clean text, a
  // false negative leaks PII. Tighten per-corpus if precision matters.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val IpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  val EmailTag = "<EMAIL>"
  val PhoneTag = "<PHONE>"
  val IpTag = "<IP>"

  /** The full scrub: all three patterns replaced, in the fixed order. */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      text, EmailRe, EmailTag), PhoneRe, PhoneTag), IpRe, IpTag)

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def ipCount(text: Column): Column = regexp_count(text, lit(IpRe))
}
