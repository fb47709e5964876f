package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction over free text — the document-level counterpart of the
  * column-level [[graft.governance.Masking]] policies, for corpora where
  * PII is embedded INSIDE a text column rather than held in its own field.
  *
  * Patterns are deliberately conservative (no lookaround, no backrefs) so
  * the same regex means the same thing in Java (Spark codegen) and RE2
  * (DuckDB oracle). Replacement is a fixed fold over the kinds in
  * [[patterns]] order — order matters when patterns could overlap, so both
  * engines must apply the same sequence.
  *
  * Scale: chained `regexp_replace`/`regexp_extract_all` are codegen'd
  * per-row expressions — narrow map, no shuffle, embarrassingly parallel.
  */
object Redaction {

  /** (kind, regex, replacement), applied in order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    ("phone", "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}", "[PHONE]"),
    ("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "[IP]"))

  /** Text with all PII kinds replaced by their placeholders. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, re, repl)) =>
      regexp_replace(c, re, repl)
    }

  /** Per-kind occurrence count columns for one text column. Counts are
    * taken on the PARTIALLY-redacted text exactly as the fold would see it
    * (an SSN hit must not also count as a phone hit), so
    * Σ counts = number of replacements [[redact]] performs. */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    var cur = text
    patterns.map { case (kind, re, repl) =>
      val n = size(regexp_extract_all(cur, lit(re), lit(0)))
      cur = regexp_replace(cur, re, repl)
      kind -> n
    }
  }

  /** Per-document redaction report: original id, redacted text, one
    * `n_<kind>` count per pattern. */
  def report(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = piiCounts(col(textCol))
    df.select(
      (col(idCol) +: counts.map { case (k, c) => c.as(s"n_$k") } :+
        redact(col(textCol)).as("redacted")): _*)
  }
}
