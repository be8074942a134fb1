package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column↔Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose the
  * engine's custom Catalyst expressions as user-facing `Column`s on Spark 4
  * (the `new Column(expr)` constructor was removed with the Connect API
  * unification). Lives under `org.apache.spark.sql` solely for package-level
  * access; contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
