package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd BPE encoding of a text column against a merge list learned
  * once on the driver ([[graft.ml.BpeTokenizer]]) and baked into the plan
  * — the tokenize-the-corpus step of a training-data build, as an in-row
  * expression: no UDF registration, no shuffle, participates in
  * whole-stage codegen like the minhash/simhash/PQ expressions.
  *
  * The ranks map is materialized once per plan (lazy) and shipped via
  * `addReferenceObj`; per row the work is the standard ranked-merge apply
  * over each whitespace word. Null text propagates null.
  */
case class BpeEncode(child: Expression, merges: Array[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires STRING, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    graft.ml.BpeTokenizer.ranksOf(merges)

  override def nullSafeEval(t: Any): Any =
    BpeEncode.compute(t.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.compute($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** Shared by interpreted eval and codegen. */
  def compute(t: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val toks = graft.ml.BpeTokenizer.encode(t.toString, ranks)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}

object TokenizerFunctions {
  /** BPE-encode a text column against a trained merge list. */
  def bpeEncode(text: Column, merges: Array[String]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), merges))
}
