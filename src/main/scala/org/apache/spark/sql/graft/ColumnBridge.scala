package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4's `Column` wraps a `ColumnNode` (Connect-compatible layer), not
  * an `Expression`; the conversion helpers live in
  * `org.apache.spark.sql.classic.ExpressionUtils` and are `private[sql]`.
  * This one-object shim sits inside the `org.apache.spark.sql` package so
  * graft's native codegen expressions (graft.functions) can be used as
  * ordinary Columns. This is the standard extension-library technique —
  * zero Spark internals are modified.
  */
object ColumnBridge {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Registers a native-expression SQL function on a LIVE session (the
    * `spark.sql.extensions` hook only applies at SparkContext build
    * time; a library handed an existing session needs the registry
    * directly — same mechanism, session-scoped). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
}
