package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-API bridge between `Column` and Catalyst `Expression` for the
  * library's native expressions (`ExpressionUtils` is `private[sql]`, so
  * this lives under the org.apache.spark.sql namespace — the standard
  * pattern Spark extension packages use).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
