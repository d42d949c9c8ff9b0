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

  /** Build a DataFrame from a raw LogicalPlan (classic Dataset.ofRows
    * is private[sql]) — needed to surface custom logical nodes. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Apply an extensions installer's injected FUNCTIONS to a live
    * session's registry. `builder.withExtensions` only takes effect
    * when the session is first created, so tests (and notebooks that
    * attach late) need this to exercise the REAL registration code
    * rather than re-declaring builder lambdas that can drift. */
  def installFunctions(spark: org.apache.spark.sql.SparkSession,
                       installer: org.apache.spark.sql.SparkSessionExtensions => Unit): Unit = {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    installer(e)
    e.registerFunctions(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry)
  }
}
