package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Skew-resistant per-group top-k (SURVEY §2.6 O-family at scale).
  *
  * A single `row_number() over (partition by key)` window puts every row of
  * a group on one task — with few or hot keys that serializes the sort
  * (classic skew: 5 event types × 120k rows each = 5 active tasks however
  * many cores exist). Two-phase form: a salted local top-k bounds every
  * task's work, then the exact window runs over at most `salt × k` rows
  * per group. Result is EXACTLY the unsalted top-k (top-k of per-salt
  * top-ks, with a total order via tie-break columns).
  */
object TopK {

  /** Top `k` rows per `key`, ordered by `order` (add tie-breaks to make it
    * a total order — exactness depends on it). `saltBy` are plain columns
    * (not sort orders) hashed into the phase-1 salt; `salt` bounds phase-1
    * parallelism per group. */
  def perGroup(df: DataFrame, key: Seq[Column], order: Seq[Column],
      saltBy: Seq[Column], k: Int, salt: Int = 16): DataFrame = {
    val saltCol = pmod(hash(saltBy: _*), lit(salt))
    val w2 = Window.partitionBy(key: _*).orderBy(order: _*)
    df.withColumn("__salt", saltCol)
      .withColumn("__rk1", row_number().over(
        Window.partitionBy(key :+ col("__salt"): _*).orderBy(order: _*)))
      .filter(col("__rk1") <= k)
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .drop("__salt", "__rk1")
  }
}
