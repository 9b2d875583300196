package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported conversion lives in `private[sql] ExpressionUtils`. This shim
  * (placed inside the org.apache.spark.sql package scope, the conventional
  * extension-library escape hatch) re-exports just the two converters that
  * custom Expressions need. No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
