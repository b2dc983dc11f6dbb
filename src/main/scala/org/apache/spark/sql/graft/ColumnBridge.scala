package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `org.apache.spark.sql` package-private Column/
  * Expression wiring (Spark 4.x classic API), so graft's custom Catalyst
  * expressions can be used as ordinary `Column`s. Same pattern as public
  * Spark-extension libraries (cf. /root/repo/SNIPPETS.md [3], a public
  * DatasetFactory bridge in `org.apache.spark.sql`).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
