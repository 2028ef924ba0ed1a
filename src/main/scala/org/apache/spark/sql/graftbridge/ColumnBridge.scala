package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the Column/Expression
  * conversion `private[sql]` (columns are backed by ColumnNodes); custom
  * Catalyst expressions still need it, so this shim lives under
  * org.apache.spark.sql — the standard extension-library pattern for
  * reaching the classic converter.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
