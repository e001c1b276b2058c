package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression converters
  * (Spark 4 moved Column onto ColumnNode; building a Column from a
  * custom Catalyst Expression goes through ExpressionUtils, which is
  * sql-private — this object lives in a sql subpackage to reach it).
  * Used only to expose graft's native codegen kernels as Columns
  * without requiring session extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
