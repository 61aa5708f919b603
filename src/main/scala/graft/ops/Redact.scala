package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and masking for training corpora — the scrubbing pass
  * that runs before text ships to a tokenizer (emails, phone numbers;
  * the pattern set is extensible per deployment).
  *
  * Patterns are deliberately restricted to syntax that Java regex and
  * RE2 (DuckDB) interpret identically — character classes, bounded
  * repetition, alternation; no backreferences or lookaround — so the
  * DuckDB oracle can mirror the exact transformation from the same
  * constants. All pure column expressions: the scrub fuses into the
  * scan stage, zero shuffles at any scale.
  */
object Redact {

  /** Email addresses (pragmatic RFC-lite shape). `(?i)` — parsed
    * identically by Java regex and RE2 — so Bob@Example.COM is caught;
    * the input text is NOT lowercased by this operator. */
  val emailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** International-ish phone numbers: leading +, 8+ digits with
    * optional separators. Anchored on digits at both ends so trailing
    * punctuation stays out of the match. */
  val phoneRe = "\\+[0-9][0-9\\-]{6,}[0-9]"

  val emailToken = "<EMAIL>"
  val phoneToken = "<PHONE>"

  def countEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(emailRe), lit(0))).cast("long")

  /** Phone count on the email-masked text, so the count always equals
    * the number of `<PHONE>` tokens [[redact]] emits — a phone-shaped
    * digit run INSIDE an email address is the email's, not a phone
    * (counting the raw text would report a phone that the masking
    * pass, which runs email-first, never replaces). */
  def countPhones(text: Column): Column =
    size(regexp_extract_all(regexp_replace(text, emailRe, emailToken),
      lit(phoneRe), lit(0))).cast("long")

  /** Mask emails first, then phones (emails contain digit runs a phone
    * pattern could partially claim; fixing the order makes the result
    * deterministic and mirror-able). */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, emailToken),
      phoneRe, phoneToken)

  /** DuckDB mirrors. Two dialect notes: DuckDB string literals keep
    * backslashes literal, so the pattern constants embed verbatim; and
    * DuckDB's regexp_replace needs the 'g' flag (first-match-only by
    * default, Spark replaces all). */
  def countEmailsSql(e: String): String =
    s"CAST(len(regexp_extract_all($e, '$emailRe')) AS BIGINT)"
  def countPhonesSql(e: String): String =
    s"CAST(len(regexp_extract_all(" +
      s"regexp_replace($e, '$emailRe', '$emailToken', 'g'), " +
      s"'$phoneRe')) AS BIGINT)"
  def redactSql(e: String): String =
    s"regexp_replace(regexp_replace($e, '$emailRe', '$emailToken', 'g'), " +
      s"'$phoneRe', '$phoneToken', 'g')"
}
