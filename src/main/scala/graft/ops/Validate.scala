package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations evaluated in ONE aggregate pass
  * (the Deequ / Great Expectations / dbt-test shape — Schelter et al.
  * 2018, "Automating Large-Scale Data Quality Verification", VLDB). The
  * contract a 100 TB ingest gate needs: a batch is validated by a SINGLE
  * scan no matter how many rules are declared, because every rule
  * reduces to an aggregate over indicator expressions — never one job
  * per rule. Output is long-format (one row per rule: violations,
  * observed metric, pass flag) so the gate is `results.filter(!pass)`
  * and the audit trail is the table itself.
  *
  * Scale shape: row-level rules (not-null / range / regex / set /
  * cross-column predicate) are codegen'd indicator sums folded into one
  * hash-free global aggregate (partial per partition, merge of a few
  * longs). Uniqueness adds `count_distinct` (the standard expand-plan,
  * one bounded shuffle). Referential rules pre-attach a membership
  * indicator via a BROADCAST left join on the distinct dim keys — the
  * fact side never shuffles. Row-count rules read the same `count(*)`.
  */
object Validate {

  /** A named expectation over a DataFrame. */
  sealed trait Rule { def name: String }

  /** `column` must never be null. */
  final case class NotNull(name: String, column: String) extends Rule

  /** The non-null tuples of `columns` must be unique. Violations count
    * the excess duplicate rows (n_nonnull_tuples − n_distinct). */
  final case class Unique(name: String, columns: Seq[String]) extends Rule

  /** Non-null `column` must lie in [lo, hi] (inclusive). */
  final case class InRange(name: String, column: String, lo: Long, hi: Long)
      extends Rule

  /** Non-null `column` must fully match `regex` (Spark `rlike` on an
    * anchored pattern — anchor it yourself for full-match semantics). */
  final case class Matches(name: String, column: String, regex: String)
      extends Rule

  /** Non-null `column` must be one of `allowed`. */
  final case class OneOf(name: String, column: String, allowed: Seq[String])
      extends Rule

  /** Arbitrary row-level invariant: `mustHold` true (or null column
    * inputs making it null → VIOLATION; unknown is never silently
    * passed). The escape hatch for cross-column rules like
    * `n_chars === length(text)`. */
  final case class Predicate(name: String, mustHold: Column) extends Rule

  /** Non-null `column` values must exist in `dimCol` of `dim`
    * (referential integrity). `dim`'s distinct keys are broadcast. */
  final case class RefIn(name: String, column: String, dim: DataFrame,
      dimCol: String) extends Rule

  /** Total row count must lie in [lo, hi]; `hi = Long.MaxValue` for a
    * lower bound only. Violations = 1 when the bound fails (the rule is
    * table-level, not row-level). */
  final case class RowCountBetween(name: String, lo: Long, hi: Long)
      extends Rule

  /** Evaluate all `rules` over `df` in one aggregate pass. Returns
    * (rule, metric, n_violations, pass): `metric` is the observed
    * measurement the rule judged (violation count for row rules,
    * distinct count for Unique, row count for RowCountBetween). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    // referential rules need a membership indicator BEFORE the aggregate:
    // broadcast the distinct dim keys, left-join once per RefIn rule
    val prepared = rules.zipWithIndex.foldLeft(df) {
      case (d, (RefIn(_, c, dim, dimCol), i)) =>
        val keys = dim.select(col(dimCol).as(s"__ref_key_$i")).distinct()
        d.join(ScaleHints.maybeBroadcast(
            keys.withColumn(s"__ref_hit_$i", lit(1))),
          d(c) === col(s"__ref_key_$i"), "left")
          .drop(s"__ref_key_$i")
      case (d, _) => d
    }

    def violations(r: Rule, i: Int): Column = r match {
      case NotNull(_, c) => count(when(col(c).isNull, 1))
      case Unique(_, cs) =>
        val nonNull = cs.map(col(_).isNotNull).reduce(_ && _)
        count(when(nonNull, 1)) - count_distinct(col(cs.head),
          cs.tail.map(col): _*)
      case InRange(_, c, lo, hi) =>
        count(when(col(c).isNotNull &&
          (col(c) < lit(lo) || col(c) > lit(hi)), 1))
      case Matches(_, c, re) =>
        count(when(col(c).isNotNull && !col(c).rlike(re), 1))
      case OneOf(_, c, allowed) =>
        count(when(col(c).isNotNull && !col(c).isInCollection(allowed), 1))
      case Predicate(_, p) => count(when(!coalesce(p, lit(false)), 1))
      case RefIn(_, c, _, _) =>
        count(when(col(c).isNotNull && col(s"__ref_hit_$i").isNull, 1))
      case _: RowCountBetween =>
        // table-level rule: resolved from the shared __rows after the agg
        first(lit(0L))
    }

    // one wide aggregate: per-rule violation counts + the shared row count
    val aggs = count(lit(1)).as("__rows") +: rules.zipWithIndex.map {
      case (r, i) => violations(r, i).cast("long").as(s"__v_$i")
    }
    val wide = prepared.agg(aggs.head, aggs.tail: _*)

    def metric(r: Rule, i: Int): Column = r match {
      case RowCountBetween(_, _, _) => col("__rows")
      case _ => col(s"__v_$i")
    }
    def resolvedViolations(r: Rule, i: Int): Column = r match {
      case RowCountBetween(_, lo, hi) =>
        when(col("__rows") >= lo && col("__rows") <= hi, lit(0L))
          .otherwise(lit(1L))
      case _ => col(s"__v_$i")
    }

    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"),
        metric(r, i).cast("long").as("metric"),
        resolvedViolations(r, i).cast("long").as("n_violations"),
        (resolvedViolations(r, i) === 0L).cast("int").as("pass"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
