package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — the temporal lookup Spark's join zoo lacks (builder
  * prompt: compose from existing operators when semantics allow, before
  * reaching for a custom physical operator). For every left row, attach
  * the right row with the greatest `tsCol` ≤ the left row's `tsCol`
  * within the same `keyCol` (the "most recent quote for this trade" /
  * "last known state for this event" shape).
  *
  * Implementation is the single-shuffle UNION + WINDOW composition, not
  * a range join: tag right rows 0 and left rows 1, sort each key
  * partition by (ts, tag), and carry the last non-null right payload
  * forward with `last(_, ignoreNulls = true)`. A right row that shares
  * the left row's timestamp sorts FIRST (tag 0 < 1), which yields the
  * inclusive `≤` match DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` defines —
  * that native implementation is this operator's oracle.
  *
  * Scale shape: ONE shuffle on `keyCol` (the window), no pair explosion,
  * no broadcast — at 100 TB this is a sort within each key partition,
  * and skewed keys are split by AQE like any other window. Right rows
  * must be unique per (key, ts) — pre-aggregate duplicates (e.g.
  * max/last-by-id) or the carried value is nondeterministic.
  */
object AsofJoin {

  /** Left columns + `valueCols` from the right side (null when no right
    * row precedes the left row). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.forall(!left.columns.contains(_)),
      "right valueCols must not collide with left columns")
    val leftCols = left.columns.toIndexedSeq
    val l = valueCols.foldLeft(left.withColumn("__tag", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val r0 = right.select((keyCol +: tsCol +: valueCols).distinct.map(col): _*)
      .withColumn("__tag", lit(0))
    val r = leftCols.filterNot(r0.columns.contains)
      .foldLeft(r0)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(l.unionByName(r.select(l.columns.map(col): _*))) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1).drop("__tag")
      .select((leftCols ++ valueCols.filterNot(leftCols.contains)).map(col): _*)
  }
}
