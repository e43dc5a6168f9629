package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd strict left-to-right dot product over two numeric arrays —
  * `acc = ((0 + a0*b0) + a1*b1) + ...` with every element widened to double
  * first, the exact IEEE sequence the DuckDB oracle's `list_reduce` fold
  * executes, so results agree bit-for-bit.
  *
  * Exists because Spark's higher-order functions (`zip_with` + `aggregate`)
  * are evaluated interpreted — one lambda closure call per element — which
  * dominates the runtime of pairwise-cosine operators (millions of pairs x
  * 64 dims). This expression participates in whole-stage codegen as a tight
  * primitive loop (reference workload: HoloChatStats `web/api.py:3009`
  * pgvector cosine search).
  *
  * Shorter array wins on length mismatch; null array propagates null;
  * array elements are assumed non-null (embedding columns).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (tx, ty) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      acc += numAt(x, i, tx) * numAt(y, i, ty)
      i += 1
    }
    acc
  }

  private def numAt(arr: ArrayData, i: Int, t: DataType): Double =
    t match {
      case DoubleType => arr.getDouble(i)
      case org.apache.spark.sql.types.FloatType => arr.getFloat(i).toDouble
      case org.apache.spark.sql.types.LongType => arr.getLong(i).toDouble
      case org.apache.spark.sql.types.IntegerType => arr.getInt(i).toDouble
      case other => throw new IllegalArgumentException(s"vec_dot: unsupported element type $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double)($getA)) * ((double)($getB));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** `vec_dot(a, b)` as a Column — strict fold dot product, codegen'd. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Squared L2 norm as a Column (dot of a vector with itself). */
  def vecNorm2(a: Column): Column = vecDot(a, a)
}
