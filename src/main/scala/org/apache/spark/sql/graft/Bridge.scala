package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's `Column` is ColumnNode-backed and the Expression bridge
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is `private[sql]`.
  * This object lives inside the `org.apache.spark.sql` package solely to
  * re-export the two conversions graft's custom Catalyst expressions need.
  * (Same approach Spark's own connectors use; no Spark internals are
  * modified.) */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
}
