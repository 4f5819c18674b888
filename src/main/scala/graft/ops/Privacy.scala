package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for corpus curation (builder-prompt
  * extension family) — the scrub step a training corpus passes before
  * release. Regex families are deliberately conservative, ordered (SSN
  * before generic phone so the more specific pattern claims the span
  * first), and engine-portable (no lookarounds: the same pattern runs
  * under Java regex and RE2, so the DuckDB oracle replays the exact
  * decision). Pure columnar `regexp_replace`/`regexp_count` chains —
  * codegen'd, no shuffle, pushes through the scan like any projection. */
object Privacy {

  /** (pattern, replacement-tag) in application order. */
  val patterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
    "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b" -> "<PHONE>")

  /** Text with every PII family replaced by its tag. */
  def redactPii(text: Column): Column =
    patterns.foldLeft(text) { case (t, (p, tag)) =>
      regexp_replace(t, p, tag)
    }

  /** Per-family match counts (BEFORE redaction), for audit rollups. */
  def piiStats(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(patterns(0)._1)).as("n_email"),
    regexp_count(text, lit(patterns(1)._1)).as("n_ip"),
    regexp_count(text, lit(patterns(2)._1)).as("n_ssn"),
    regexp_count(text, lit(patterns(3)._1)).as("n_phone"))
}
