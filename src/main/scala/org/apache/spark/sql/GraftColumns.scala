package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placed shim: `classic.ExpressionUtils` is `private[sql]`, so
  * this is the sanctioned way for a library to wrap a custom Catalyst
  * [[Expression]] in a [[Column]] without a session function registry
  * (needed by column functions like `graft.functions.TextFunctions.tokens`
  * that have no SparkSession in scope). Only Spark's public artifact is
  * referenced. */
object GraftColumns {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
