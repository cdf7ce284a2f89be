package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII-style scrubbing for training corpora: find-and-replace of
  * email addresses and URLs with stable placeholder tokens, plus the
  * per-document match counts a curation pipeline reports.
  *
  * Patterns stay inside the regex subset Java's engine and RE2 (the
  * DuckDB oracle) interpret identically — explicit character classes,
  * no lookaround, no backreferences. Pure map-side `regexp_replace` /
  * `regexp_extract_all`: codegen'd, no shuffle, pushes nothing past
  * the scan it doesn't need.
  */
object Scrub {

  /** Explicit-class patterns, identical semantics in Java regex & RE2. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[A-Za-z0-9./_%-]+"

  def scrub(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), urlRe, "<URL>")

  /** Per-document scrub report: match counts + scrubbed text length
    * (the scrubbed text itself is kept out of the projection so the
    * report stays narrow). */
  def piiReport(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    // three regex passes per row — spread a narrow input so they
    // don't serialize on one scan task (Par.spread's contract)
    Par.spread(df).select(col(idCol),
      size(regexp_extract_all(t, lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(urlRe), lit(0))).as("n_urls"),
      length(scrub(t)).as("scrubbed_len"))
  }
}
