package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridges between the Spark 4 `Column` API (ColumnNode-backed) and raw
  * Catalyst `Expression`s, for the custom expressions in this package. */
package object expr {
  def toExpr(c: Column): Expression = org.apache.spark.sql.graft.Bridge.toExpr(c)
  def toCol(e: Expression): Column = org.apache.spark.sql.graft.Bridge.toCol(e)
}
