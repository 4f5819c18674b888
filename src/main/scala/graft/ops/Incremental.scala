package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance — refresh a per-key
  * aggregate from a raw DELTA without rescanning the aggregated base
  * (the batch form of streaming's update-mode aggregation, and the
  * nightly-refresh shape every warehouse rollup runs at 100 TB: the
  * base table is petabytes, the day's delta is gigabytes; only the
  * delta is scanned and only touched keys shuffle).
  *
  * Counts and sums are self-mergeable (sum of sums); the sum accumulates
  * in DECIMAL so refresh order cannot perturb the result (float addition
  * is not associative — a refreshed view must be bit-equal to a full
  * recompute, or downstream equality checks break).
  */
object Incremental {

  /** Aggregate `delta` per `keyCols` (count + DECIMAL sum of `valueCol`)
    * and merge into `base`, which carries the same (keyCols, nCol,
    * sumCol) schema from a prior refresh. New keys appear, untouched
    * keys pass through unchanged — a full outer merge on the key. */
  def refreshCountSum(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
      nCol: String, sumCol: String, valueCol: String): DataFrame = {
    val d = delta.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__dn"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__dsum"))
    base.join(d, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(nCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(nCol),
        (coalesce(col(sumCol), lit(0).cast("decimal(18,2)")) +
          coalesce(col("__dsum"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as(sumCol)): _*)
  }
}
