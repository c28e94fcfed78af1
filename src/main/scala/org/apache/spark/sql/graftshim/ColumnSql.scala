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
}
