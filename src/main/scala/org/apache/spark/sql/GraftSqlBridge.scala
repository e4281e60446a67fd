package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. Spark 4 made the converters
  * `private[sql]` (Column wraps a ColumnNode, not an Expression), so
  * libraries shipping native expressions need one file in this package —
  * the established pattern for Spark-extension libraries.
  *
  * VERSION PIN: `classic.ExpressionUtils` is an internal class with no
  * compatibility contract — this coupling is pinned to the Spark 4.1.x
  * line and guarded by SparkPrivateApiPinSpec, which fails loudly (with
  * the full private-API inventory) on any version bump so the surface is
  * re-verified instead of silently misbehaving.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
