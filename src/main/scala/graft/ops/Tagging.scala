package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dolma-style curation (Soldaini et al. 2024, "Dolma: an Open Corpus of
  * Three Trillion Tokens…" — their tagger/mixer architecture): TAG once,
  * FILTER many times. Taggers are named attribute columns computed in a
  * single linear pass over the text; rules are named boolean predicates
  * over the ATTRIBUTES only, never the raw text — so re-curating with new
  * thresholds reads a narrow attrs table instead of rescanning the
  * corpus, and every dropped document records WHICH rules dropped it
  * (the audit trail corpus engineering actually debugs with).
  *
  * Scale shape: tagging is a pure per-row projection (codegen'd, no
  * shuffle — write it back beside the corpus as its own column family);
  * rule application is another projection; only the audit rollup
  * aggregates, and it aggregates reason tokens, not documents.
  */
object Tagging {

  /** Attach each named tagger as a column. Taggers must be pure
    * per-row expressions (no aggregates) — that is what keeps the pass
    * shuffle-free and restartable per split. */
  def tagAttributes(df: DataFrame, taggers: Seq[(String, Column)]): DataFrame =
    taggers.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }

  /** Apply named keep-rules over the tagged attributes. Each rule is
    * (name, passPredicate); a row failing a rule collects the rule's
    * name. Output adds `drop_reasons` (comma-joined names in rule order
    * — empty when clean) and `keep`. A null predicate (null attrs)
    * counts as a failure: unknown is never silently kept. */
  def applyRules(tagged: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val reasonCols = rules.map { case (name, pass) =>
      when(!coalesce(pass, lit(false)), lit(name))
    }
    tagged
      .withColumn("drop_reasons", concat_ws(",", reasonCols: _*))
      .withColumn("keep", col("drop_reasons") === "")
  }

  /** Per-rule drop counts from [[applyRules]] output — the "which rule
    * costs how much corpus" audit. Aggregates exploded reason tokens
    * (bounded by rules × dropped docs), one hash shuffle. */
  def ruleStats(curated: DataFrame): DataFrame =
    curated.filter(col("drop_reasons") =!= "")
      .select(explode(split(col("drop_reasons"), ",")).as("reason"))
      .groupBy("reason")
      .agg(count(lit(1)).as("n_dropped"))
}
