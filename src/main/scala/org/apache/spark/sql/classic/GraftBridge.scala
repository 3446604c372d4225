package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column ↔ catalyst Expression conversion, which
  * Spark 4 keeps `private[sql]`. Lives in the `classic` package solely to
  * re-export the two conversions our native expressions (graft.functions)
  * need; no Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
