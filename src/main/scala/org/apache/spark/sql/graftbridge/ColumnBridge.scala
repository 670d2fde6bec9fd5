package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column API is decoupled from Catalyst (`ColumnNode` instead
  * of `Expression`); the conversion helpers live behind `private[sql]`.
  * This bridge re-exports them for graft's native-Expression functions
  * (MinHash/SimHash signatures). Public Spark API everywhere else.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
