package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass data profiling — the constraint/quality summary a 100 TB
  * ingest job runs before committing a batch (the Deequ/dbt-test shape):
  * per column its null count, exact distinct count, and min/max, as ONE
  * aggregate over the scan. Everything is a plain hash aggregate —
  * `count(distinct)` per column expands to the standard expand-plan, so
  * the pass stays shuffle-bounded and columnar; no driver-side loops.
  *
  * Output is LONG-format (one row per column) so downstream checks are
  * joins against expectation tables, and min/max are stringified so one
  * schema fits every column type.
  */
object Profile {

  /** (column, n_rows, n_null, n_distinct, min_str, max_str) for each of
    * `cols` (default: every column of `df`). */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toIndexedSeq
    val aggs = targets.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = targets.map { c =>
      struct(lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"), col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Per-group standardization (outlier scoring) of an integer metric:
    * attach each row's z-score within its group, as floored milli-units.
    *
    * The moments come from EXACT integer sums (Σx, Σx², n — one partial-
    * aggregated shuffle on the group key), never from a distributed
    * floating `stddev` whose merge order is nondeterministic; the double
    * arithmetic downstream is the same expression tree on both engines
    * over those exact integers, so the result is bit-reproducible:
    * mean = S/n, var = (S2 − S·S/n)/(n−1), z = (x − mean)/√var.
    * Groups with n < 2 or zero variance emit NULL. The stats table is
    * group-cardinality-sized — tiny — so the join back is a broadcast. */
  def zscorePerGroup(df: DataFrame, groupCol: String, metricCol: String):
      DataFrame = {
    val x = col(metricCol).cast("long")
    // Σx² accumulates in decimal(38,0): a LongType square-sum silently
    // wraps once |x| passes ~3e9·√n — decimal keeps the sum exact for
    // any realistic metric and still converts losslessly to double below
    val xd = col(metricCol).cast("decimal(38,0)")
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"), sum(x).as("__s"), sum(xd * xd).as("__s2"))
    val n = col("__n").cast("double")
    val s = col("__s").cast("double")
    val mean = s / n
    val variance = (col("__s2").cast("double") - s * s / n) / (n - lit(1))
    df.join(broadcast(stats), groupCol)
      .withColumn("z_milli",
        when(col("__n") >= 2 && variance > 0,
          floor(lit(1000) * ((x.cast("double") - mean) / sqrt(variance)))
            .cast("long")))
      .drop("__n", "__s", "__s2")
  }
}
