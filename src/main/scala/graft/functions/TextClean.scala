package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training text — mask emails, URLs, and phone-like
  * number runs with typed placeholder tokens, and count what was
  * masked (the counts feed quality dashboards / drop rules).
  *
  * The regexes stay inside the syntax subset Java regex and RE2 share
  * (character classes, bounded repetition — no lookaround, no
  * backreferences), so the DuckDB oracle replays the masking
  * byte-for-byte. All per-row column expressions: no shuffle, no UDF —
  * masking 100 TB pipelines inside the scan stage.
  */
object TextClean {

  /** Order matters and is fixed: URLs first (an email-shaped substring
    * inside a URL must become part of `<URL>`, not `<EMAIL>`), then
    * emails, then phone-like runs. */
  val urlRe = "https?://[^\\s]+"
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"

  def maskPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlRe, "<URL>"),
        emailRe, "<EMAIL>"),
      phoneRe, "<PHONE>")

  /** Match counts on the ORIGINAL text, per category. */
  def nUrls(text: Column): Column = regexp_count(text, lit(urlRe)).cast("long")
  def nEmails(text: Column): Column = regexp_count(text, lit(emailRe)).cast("long")
  def nPhones(text: Column): Column = regexp_count(text, lit(phoneRe)).cast("long")
}
