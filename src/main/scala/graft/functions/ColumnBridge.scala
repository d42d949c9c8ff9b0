// Lives under org.apache.spark.sql so it can reach the private[sql]
// Column <-> Expression bridge (Spark 4 removed Column.expr from the
// public API; this is the sanctioned seam for native-expression
// libraries built on the classic backend).
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
