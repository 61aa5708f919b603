package graft

import org.apache.spark.sql.functions._
import graft.ops.Redact

/** PII masking: emails and phones found and replaced, clean text
  * untouched, and the email-before-phone order keeps a phone pattern
  * from partially claiming an email's digit run. */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): (Long, Long, String) =
    Seq(text).toDF("t")
      .select(Redact.countEmails($"t"), Redact.countPhones($"t"),
        Redact.redact($"t"))
      .as[(Long, Long, String)].head()

  test("masks emails and phones, counts match") {
    assert(run("mail bob.smith+x@foo-bar.io now") ===
      ((1L, 0L, "mail <EMAIL> now")))
    assert(run("call +1-555-0123456 today") ===
      ((0L, 1L, "call <PHONE> today")))
    assert(run("a@b.co or +44-20-7946-0958.") ===
      ((1L, 1L, "<EMAIL> or <PHONE>.")))
  }

  test("mixed-case emails are caught (patterns are case-insensitive)") {
    assert(run("write Bob@Example.COM today") ===
      ((1L, 0L, "write <EMAIL> today")))
  }

  test("clean text passes through byte-identical") {
    assert(run("no contact info here 12345") ===
      ((0L, 0L, "no contact info here 12345")))
  }

  test("phone-shaped digits inside an email are the email's, not a phone") {
    // phoneRe alone would match '+1-5551234' inside the address; the
    // count must agree with the redacted output, which masks the whole
    // address email-first and emits zero <PHONE> tokens
    assert(run("reach a+1-5551234@b.co now") ===
      ((1L, 0L, "reach <EMAIL> now")))
  }

  test("two of a kind, all masked (global replace)") {
    assert(run("x@y.de then z@w.fr") === ((2L, 0L, "<EMAIL> then <EMAIL>")))
  }
}
