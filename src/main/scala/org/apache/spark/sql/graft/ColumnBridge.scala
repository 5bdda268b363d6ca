package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's classic Column ⇄ catalyst Expression conversion
  * (ExpressionUtils is private[sql]; this object lives under
  * org.apache.spark.sql so it may call it — the standard extension-point
  * technique for libraries that define custom Catalyst expressions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
