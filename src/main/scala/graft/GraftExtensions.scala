package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{DotProduct, TextFunctions}

/** Spark SQL integration: registers graft's functions so they are callable
  * from `spark.sql(...)` / `selectExpr`.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *    (the standard Spark plugin mechanism), or
  *  - `GraftExtensions.register(spark)` on an already-running session.
  *
  * `vec_dot` is the native codegen'd expression; the text functions are
  * injected as builders that expand to the same Column expression trees the
  * DataFrame API uses, so SQL and DataFrame callers share one definition
  * (and one oracle).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), GraftExtensions.info(name), builder))
    }
}

object GraftExtensions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  private def unary(f: Column => Column): Seq[Expression] => Expression =
    args => ColumnBridge.eagerExpression(f(ColumnBridge.column(args.head)))

  /** name -> expression builder for every SQL-exposed graft function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> ((args: Seq[Expression]) => DotProduct(args(0), args(1))),
    "vec_norm2" -> ((args: Seq[Expression]) => DotProduct(args.head, args.head)),
    // vec_sum(arr, dim): dim must be a literal int (aggregate buffer size)
    "vec_sum" -> ((args: Seq[Expression]) =>
      graft.functions.VectorSumAgg(args(0),
        args(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression()),
    "graft_categorize" -> unary(TextFunctions.categorize),
    "graft_membership_rank" -> unary(TextFunctions.membershipRank),
    "graft_has_humor" -> unary(TextFunctions.hasHumor),
    "graft_lang_id" -> unary(TextFunctions.langId),
    "graft_ws_tokens" -> unary(TextFunctions.wsTokenCount),
    "graft_bpe_tokens" -> unary(TextFunctions.bpeTokenCount),
    "graft_quality" -> unary(TextFunctions.qualityScore),
    "graft_fingerprint" -> unary(TextFunctions.polyFingerprint))

  /** Register every graft function on an existing session (idempotent —
    * re-registration overwrites with the identical builder).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, FunctionIdentifier(name), info(name), builder)
    }
}
