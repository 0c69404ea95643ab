package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` API: converting between a public
  * `Column` and its Catalyst `Expression` so graft can define native
  * codegen expressions (graft.functions.VectorExpressions) without
  * forking Spark. This is the only `org.apache.spark.sql`-packaged code
  * in the project and it delegates 1:1 to Spark's own helpers.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
