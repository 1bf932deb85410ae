package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and catalyst `Expression`s.
  *
  * Spark 4.x hides the classic Column↔Expression conversions behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); libraries
  * that add custom codegen expressions conventionally reach them from a shim
  * object placed inside the `org.apache.spark.sql` package namespace. This is
  * the only file outside the `graft` package.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
