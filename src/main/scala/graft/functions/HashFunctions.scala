package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd k-permutation minhash signature over a shingle-id set:
  * `sig[j] = min over s of ((s mod p) * a(j) + b(j)) mod p`.
  *
  * Exists because expressing the signature as k separate
  * `array_min(transform(...))` columns evaluates k interpreted lambda
  * passes per row; this expression is one primitive double loop inside
  * whole-stage codegen. Arithmetic is identical to the per-perm affine
  * formulation, so results (and the DuckDB oracle) are unchanged.
  *
  * Returns null for a null array; an empty array yields Long.MaxValue
  * sentinels (callers filter empty shingle sets upstream).
  */
case class MinhashSignature(child: Expression, aConsts: Seq[Long], bConsts: Seq[Long], prime: Long)
    extends UnaryExpression {

  require(aConsts.length == bConsts.length && aConsts.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private lazy val aArr = aConsts.toArray
  private lazy val bArr = bConsts.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val k = aArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val x = arr.getLong(i) % prime
      var j = 0
      while (j < k) {
        val h = (x * aArr(j) + bArr(j)) % prime
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val k = aArr.length
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $x = $c.getLong($i) % ${prime}L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $h = ($x * $aRef[$j] + $bRef[$j]) % ${prime}L;
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** Minhash signature Column over an ARRAY<BIGINT> shingle-id column. */
  def minhashSignature(shingles: Column, aConsts: Seq[Long], bConsts: Seq[Long],
                       prime: Long): Column =
    ColumnBridge.column(
      MinhashSignature(ColumnBridge.expression(shingles), aConsts, bConsts, prime))
}
