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
  * partition by (ts, tag), and carry the last right payload forward with
  * `last(_, ignoreNulls = true)`. The payload is ONE struct(valueCols)
  * built only on right rows — never per-column — so a matched right row
  * whose payload value is legitimately NULL yields NULL (not a stale
  * older row's value), and with several valueCols every output field
  * comes from the SAME matched right row. A right row that shares the
  * left row's timestamp sorts FIRST (tag 0 < 1), which yields the
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
    val payloadType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)).toArray)
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r0 = right.select((keyCol +: tsCol +: valueCols).distinct.map(col): _*)
      .withColumn("__tag", lit(0))
      .withColumn("__payload", struct(valueCols.map(col): _*))
      .select(col(keyCol), col(tsCol), col("__tag"), col("__payload"))
    val r = leftCols.filterNot(r0.columns.contains)
      .foldLeft(r0)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
    valueCols.foldLeft(carried.filter(col("__tag") === 1)) {
        (df, c) => df.withColumn(c, col("__payload").getField(c))
      }
      .select((leftCols ++ valueCols.filterNot(leftCols.contains)).map(col): _*)
  }
}
