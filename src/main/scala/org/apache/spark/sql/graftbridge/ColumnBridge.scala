package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made this conversion
  * `private[sql]` (columnNodeSupport.scala); custom native expressions
  * still need it to surface as Columns, so this one-liner lives under the
  * sql package — the same technique every Spark-native extension library
  * uses. No other internal API is touched. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
