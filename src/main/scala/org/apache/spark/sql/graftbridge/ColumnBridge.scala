/* Bridge into Spark's private[sql] Column ↔ Expression conversion.
 * Spark 4 wraps Column around ColumnNode and scopes the classic
 * converters private[sql]; extension libraries adding native
 * expressions need this one hop. Public Spark API only beyond that. */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
