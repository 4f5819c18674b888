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

  /** k-anonymity risk audit (Sweeney 2002): every combination of the
    * quasi-identifier columns with its population and an at-risk flag
    * (anonymity set smaller than `k` — rows a linkage attack can narrow
    * to fewer than k candidates). One hash aggregate on the QI tuple;
    * output is QI-cardinality-sized, the raw table never re-shuffles. */
  def kAnonymity(df: org.apache.spark.sql.DataFrame,
      quasiCols: Seq[String], k: Long): org.apache.spark.sql.DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", (col("n") < k).cast("int"))

  /** l-diversity audit: k-anonymity bounds group SIZE, but a group whose
    * members all share one sensitive value still leaks it (homogeneity
    * attack — re-identification isn't needed when everyone in the bucket
    * has the secret). l-diversity requires ≥ l DISTINCT sensitive values
    * per QI group. Same single-shuffle aggregate as [[kAnonymity]], with
    * an exact distinct on the sensitive column riding the same shuffle. */
  def lDiversity(df: org.apache.spark.sql.DataFrame, quasiCols: Seq[String],
      sensitive: Column, l: Long): org.apache.spark.sql.DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("at_risk", (col("n_sensitive") < l).cast("int"))

  /** Enforcement: drop every row whose QI group has fewer than `k`
    * members (suppression — the blunt but sound fix; generalization,
    * i.e. coarsening the QI columns first, preserves more rows). A
    * window count over the QI partition: ONE shuffle, no second scan of
    * the table and no join — group sizes never leave their partition. */
  def suppressSmallGroups(df: org.apache.spark.sql.DataFrame,
      quasiCols: Seq[String], k: Long): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    df.withColumn("__ksize", count(lit(1)).over(w))
      .filter(col("__ksize") >= k)
      .drop("__ksize")
  }
}
