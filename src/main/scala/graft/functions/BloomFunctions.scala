package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership expressions over a BROADCAST filter handle.
  *
  * Spark's own `BloomFilterMightContain` takes the serialized filter as a
  * BINARY child — in the train-once flow (graft.operators.Pipeline
  * `decontaminateBloom`) that means a multi-MB literal EMBEDDED in the
  * plan: it rides every task binary (the bench tail's "broadcasting large
  * task binary" warnings) and is deserialized once per task per
  * expression instance (~3.6 MB of bit-array copying × tasks × stages —
  * measurable CPU at 32 cores, a real cost at 1000 executors). These
  * expressions hold an `org.apache.spark.broadcast.Broadcast[BloomFilter]`
  * instead: the task binary carries only the broadcast handle, the filter
  * ships once per EXECUTOR through the broadcast manager, and
  * deserialization happens once per executor, cached by the broadcast.
  *
  * Lookup semantics are exactly `BloomFilterMightContain` on a BIGINT key
  * (`mightContainLong`), so results — and the shared DuckDB oracle — are
  * unchanged.
  */
case class BloomContainsLong(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains_long requires BIGINT, got ${other.catalogString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains_long"

  @transient private lazy val filter: BloomFilter = bf.value

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomBc", bf, classOf[Broadcast[_]].getName)
    val bloom = ctx.addMutableState(classOf[BloomFilter].getName, "bloomFilter")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($bloom == null) { $bloom = (${classOf[BloomFilter].getName}) $bfRef.value(); }
         |${ev.value} = $bloom.mightContainLong($c);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** True iff ANY element of an ARRAY<BIGINT> might be in the broadcast
  * filter — the doc-level prune that keeps the zero-hit majority of a
  * corpus from materializing its exploded shingle rows at all. One
  * primitive loop with early exit, inside whole-stage codegen.
  */
case class BloomAnyContain(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_any_contain requires ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_any_contain"

  @transient private lazy val filter: BloomFilter = bf.value

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    var found = false
    while (i < n && !found) {
      found = filter.mightContainLong(arr.getLong(i))
      i += 1
    }
    found
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomBc", bf, classOf[Broadcast[_]].getName)
    val bloom = ctx.addMutableState(classOf[BloomFilter].getName, "bloomFilter")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |if ($bloom == null) { $bloom = (${classOf[BloomFilter].getName}) $bfRef.value(); }
         |final int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($bloom.mightContainLong($c.getLong($i))) { ${ev.value} = true; break; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {
  def bloomContainsLong(key: Column, bf: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomContainsLong(ColumnBridge.expression(key), bf))

  def bloomAnyContain(keys: Column, bf: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomAnyContain(ColumnBridge.expression(keys), bf))
}
