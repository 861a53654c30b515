package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions.
  *
  * Spark 4 split Column into an API facade backed by ColumnNodes; the only
  * supported conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`. This object re-exports the two conversions graft needs to
  * attach custom Catalyst expressions (e.g. FloatVectorDot) to DataFrame
  * code. Kept deliberately minimal.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
