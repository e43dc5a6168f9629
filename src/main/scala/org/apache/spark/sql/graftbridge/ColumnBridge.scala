package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
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

  /** EAGER Column -> Expression conversion. `expression` wraps the column
    * node lazily (fine inside Dataset.select, which resolves it), but a
    * FunctionRegistry builder must return a real catalyst tree — the lazy
    * wrapper is Unevaluable and never gets resolved in a SQL plan.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a function on a LIVE session's registry (sessionState is
    * private[sql]; session-build-time injection should use
    * `spark.sql.extensions=graft.GraftExtensions` instead).
    */
  def registerFunction(spark: SparkSession, name: FunctionIdentifier,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
