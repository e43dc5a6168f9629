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

  private def expectArity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")

  private def unary(name: String, f: Column => Column): Seq[Expression] => Expression =
    args => {
      expectArity(name, args, 1)
      ColumnBridge.eagerExpression(f(ColumnBridge.column(args.head)))
    }

  /** name -> expression builder for every SQL-exposed graft function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> ((args: Seq[Expression]) => {
      expectArity("vec_dot", args, 2)
      DotProduct(args(0), args(1))
    }),
    "vec_norm2" -> ((args: Seq[Expression]) => {
      expectArity("vec_norm2", args, 1)
      DotProduct(args.head, args.head)
    }),
    // vec_sum(arr, dim): dim must be a foldable int (aggregate buffer size)
    "vec_sum" -> ((args: Seq[Expression]) => {
      expectArity("vec_sum", args, 2)
      if (!args(1).foldable)
        throw new IllegalArgumentException("vec_sum: dim must be a literal integer")
      graft.functions.VectorSumAgg(args(0),
        args(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression()
    }),
    "graft_simhash" -> ((args: Seq[Expression]) => {
      expectArity("graft_simhash", args, 1)
      graft.functions.SimhashBits(args.head)
    }),
    "graft_categorize" -> unary("graft_categorize", TextFunctions.categorize),
    "graft_membership_rank" -> unary("graft_membership_rank", TextFunctions.membershipRank),
    "graft_has_humor" -> unary("graft_has_humor", TextFunctions.hasHumor),
    "graft_lang_id" -> unary("graft_lang_id", TextFunctions.langId),
    "graft_ws_tokens" -> unary("graft_ws_tokens", TextFunctions.wsTokenCount),
    "graft_bpe_tokens" -> unary("graft_bpe_tokens", TextFunctions.bpeTokenCount),
    "graft_quality" -> unary("graft_quality", TextFunctions.qualityScore),
    "graft_fingerprint" -> unary("graft_fingerprint", TextFunctions.polyFingerprint),
    // nearest_centroid(v, dim, cent): cent must be a foldable ARRAY<DOUBLE>
    // of k×dim row-major centroid components; returns struct(cluster, dist)
    "nearest_centroid" -> ((args: Seq[Expression]) => {
      expectArity("nearest_centroid", args, 3)
      if (!args(1).foldable || !args(2).foldable)
        throw new IllegalArgumentException(
          "nearest_centroid: dim and centroids must be literals")
      val dim = args(1).eval().asInstanceOf[Number].intValue()
      val cent = args(2).eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toDoubleArray()
        case _ => throw new IllegalArgumentException(
          "nearest_centroid: centroids must be a literal ARRAY<DOUBLE>")
      }
      // the literal array is re-shipped as a broadcast bundle so the
      // resolved plan's task binaries stay O(1) in the centroid count
      // (the builder runs at analysis time on the driver, where the
      // session is active)
      graft.functions.NearestCentroid(args(0),
        graft.functions.CentroidBundle.broadcast(cent, dim))
    }),
    // bpe_encode(text, merges): merges must be a foldable ARRAY<STRING> in
    // rank order, each element 'left right' (one space) — the merge-table
    // rows Pipeline.bpeTrain emits, concat_ws(' ', left, right)
    "bpe_encode" -> ((args: Seq[Expression]) => {
      expectArity("bpe_encode", args, 2)
      if (!args(1).foldable ||
          !args(1).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
          args(1).dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType !=
            org.apache.spark.sql.types.StringType)
        throw new IllegalArgumentException(
          "bpe_encode: merges must be a literal ARRAY<STRING>")
      val merges = args(1).eval() match {
        case null => Array.empty[String]
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          a.toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType).map(u => if (u == null) "" else u.toString)
      }
      graft.functions.BpeEncode(args(0), merges)
    }))

  /** Register every graft function on an existing session (idempotent —
    * re-registration overwrites with the identical builder).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, FunctionIdentifier(name), info(name), builder)
    }
}
