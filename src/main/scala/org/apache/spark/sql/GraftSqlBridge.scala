package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions — the same
  * hooks Spark's own `functions` object uses. Spark 4 wraps Columns in
  * ColumnNodes, so third-party native expressions need this one seam to
  * surface as Columns; everything else in graft stays outside Spark's
  * namespace.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
