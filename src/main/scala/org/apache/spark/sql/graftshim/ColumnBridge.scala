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

  /** Register an expression builder as a session-scoped SQL function
    * (`sessionState.functionRegistry` is likewise `private[sql]`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
}
