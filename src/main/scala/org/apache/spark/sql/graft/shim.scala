package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 routes Column through ColumnNode;
  * the conversion helpers live in `org.apache.spark.sql.classic` with
  * package-private visibility, so this one-file shim re-exports them for
  * graft's custom expressions. No Spark internals are modified.
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
