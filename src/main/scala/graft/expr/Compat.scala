package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.GraftShim

/** Lift custom Catalyst [[Expression]]s into the public `Column` API
  * (Spark 4.x moved the classic conversions behind `private[sql]`; see
  * [[org.apache.spark.sql.graftshim.GraftShim]]).
  */
object Compat {
  def column(e: Expression): Column = GraftShim.column(e)
  def expression(c: Column): Expression = GraftShim.expression(c)
}
