package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column⇄Expression converters of Spark 4's
  * classic API, so graft's custom Catalyst expressions can surface as
  * `Column`s. Lives under `org.apache.spark.sql` for access, exposes a
  * public face for the `graft` package. */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)

  /** The string-or-binary input contract Spark's own `md5` declares —
    * `TypeCollection` and `AbstractDataType` are `private[sql]`, so the
    * `Seq` is built here (inferred types keep the private names out of
    * caller signatures). */
  val stringOrBinaryInput = Seq(org.apache.spark.sql.types.TypeCollection(
    org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.BinaryType))
}
