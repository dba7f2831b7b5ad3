package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge. Spark 4 moved the classic
  * converters behind `private[sql]` (Column is now a ColumnNode facade);
  * operators that build native expressions with non-literal constant
  * parameters (e.g. a trained centroid table) need exactly this hop, so
  * it is exposed from inside the sql package namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
