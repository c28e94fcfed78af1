package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter

/** Bridge into Spark's `private[sql]` Column → Catalyst Expression
  * conversion (Spark 4 moved `Column.expr` behind the classic adapter;
  * the lazy `ExpressionUtils.expression` wrapper does not render to SQL,
  * so convert the column node eagerly). Used by graft's model serializer
  * to render fitted ColumnStage expressions as self-contained SQL text. */
object ColumnSql {
  def sqlOf(c: Column): String = ColumnNodeToExpressionConverter(c.node).sql

  /** Wrap a raw Catalyst Expression as a user-facing Column (the
    * reverse bridge — Spark 4 hides the Expression constructor behind
    * the classic adapter). Used for graft's native expressions. */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Column → Catalyst Expression (both bridges are private[sql]). */
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Column → Catalyst Expression, converted EAGERLY (the lazy wrapper
    * above defers conversion to the analyzer; FunctionRegistry builders
    * need a concrete expression tree at registration-call time). */
  def eagerExpressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnNodeToExpressionConverter(c.node)
}
