package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 wraps Column around ColumnNode; the Expression↔Column bridge
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is private[sql], so
  * this accessor lives under the sql package namespace — the idiomatic
  * extension-library workaround for exposing custom Catalyst
  * expressions as Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
