package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions so
  * graft can plug custom Catalyst expressions (e.g. graft.functions.DotProduct)
  * into the public Column API. Lives under org.apache.spark.sql because the
  * helpers are package-private to sql — the standard pattern for Spark
  * extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
