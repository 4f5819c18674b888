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

  /** Snapshot diff (CDC between two corpus versions — the "what changed
    * between crawl N and crawl N+1" audit): keys only in `newDf` are
    * `added`, only in `oldDf` are `removed`, present in both with a
    * different payload hash are `changed`; unchanged rows drop out.
    * ONE full-outer join on the key comparing per-side md5 — payloads
    * never ship, only their hashes, so the shuffle is key+32 bytes per
    * row regardless of document size. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      payloadCol: String): DataFrame = {
    // presence markers, NOT hash nullness: a row with a NULL payload
    // exists on its side (md5(NULL) is NULL and would misclassify it as
    // absent); hashes compare null-safely below for the same reason
    val o = oldDf.select(col(keyCol), md5(col(payloadCol)).as("__oh"),
      lit(1).as("__op"))
    val n = newDf.select(col(keyCol), md5(col(payloadCol)).as("__nh"),
      lit(1).as("__np"))
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("change_type",
        when(col("__op").isNull, "added")
          .when(col("__np").isNull, "removed")
          .when(!(col("__oh") <=> col("__nh")), "changed"))
      .filter(col("change_type").isNotNull)
      .select(col(keyCol), col("change_type"))
  }
}
