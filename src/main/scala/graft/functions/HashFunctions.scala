package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  // same analysis-time guard as the sibling expressions: a non-long array
  // would read garbage through ArrayData.getLong at runtime otherwise
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires ARRAY<BIGINT>, got ${other.catalogString}")
    }

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

/** 60-bit SimHash over a word array, computed entirely IN-ROW: for each
  * non-empty word, the first 60 md5 bits vote ±1 per bit position; bit j of
  * the result is set iff the sum is positive. Bit patterns are identical to
  * the SQL formulation `conv(substring(md5(word), 1, 15), 16, 10)` so the
  * DuckDB oracle is unchanged.
  *
  * Exists because SimHash is a pure per-document function: the
  * explode-words → groupBy(doc_id) formulation shuffles every word
  * occurrence in the corpus, which at 100 TB is a full-corpus shuffle for
  * something computable map-side. Null array propagates null; null/empty
  * words are skipped (an all-empty array hashes to 0).
  */
case class SimhashBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_bits requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(v: Any): Any =
    SimhashBits.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the md5 loop lives in a compiled helper; codegen keeps the call site
    // inside the whole-stage pipeline (no interpreted expression fallback)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashBits.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashBits {
  /** Shared by interpreted eval and codegen. One MessageDigest per row
    * (= per document), reset per word.
    */
  def compute(arr: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null && w.numBytes() > 0) {
        md.reset()
        val d = md.digest(w.getBytes)
        // first 15 hex chars of the md5 = bytes 0-6 plus the high nibble of
        // byte 7, read big-endian — exactly conv(substr(md5, 1, 15), 16, 10)
        var x = 0L
        var b = 0
        while (b < 7) { x = (x << 8) | (d(b) & 0xffL); b += 1 }
        x = (x << 4) | ((d(7) & 0xf0L) >>> 4)
        var j = 0
        while (j < 60) {
          sums(j) += (if (((x >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 60) { if (sums(j) > 0) h |= (1L << j); j += 1 }
    h
  }
}

/** Codegen'd |a ∩ b| over two SORTED distinct ARRAY<BIGINT> columns — the
  * exact-Jaccard/overlap verify kernel of the dedup suite.
  *
  * Exists because `size(array_intersect(a, b))` builds a hash set PER ROW;
  * candidate verification evaluates one intersection per candidate PAIR
  * (millions at corpus scale), and the allocation-free O(n+m) two-pointer
  * merge walk inside whole-stage codegen is ~10x cheaper (measured 30s →
  * 3s task CPU on the capped n-gram verify at sf0.1). Callers guarantee
  * sortedness by building shingle sets with `array_sort(array_distinct(…))`
  * — [[graft.operators.Dedup]]'s shared shingling does.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_size requires two ARRAY<BIGINT>, got ${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (na, nb) = (ctx.freshName("na"), ctx.freshName("nb"))
      val (i, j, n) = (ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("n"))
      val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $n++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** In-row two-pointer split of a SORTED distinct ARRAY<BIGINT> column
  * against ONE broadcast sorted long array: `keep = true` returns the
  * elements present in the broadcast set (≡ the former
  * `sort_array(collect_list(...))` of an inner join against it),
  * `keep = false` the elements absent from it (≡ a left-anti join).
  *
  * Exists for [[graft.operators.Dedup.ngramJaccard]]'s capped path: the
  * hot-shingle set is bounded small by the cap's own design (a handful of
  * stopword shingle values — the same bound the former plan relied on to
  * BROADCAST the relation), so per-doc hot/rare sub-arrays are in-row
  * projections of the cached shingle relation instead of an
  * explode + broadcast-join + collect_list re-aggregation pass per use
  * (one full extra pass over every shingle instance, measured ~5 s task
  * CPU at sf0.1). The broadcast handle keeps task binaries O(1) — the
  * [[TopProbeLabels]] bundle discipline, not a plan-riding literal.
  *
  * Output order: input order (sorted, callers guarantee it — the shared
  * shingling builds sorted distinct sets), exactly matching both the
  * anti-join's explode order and the former `sort_array` result.
  */
case class SortedFilterBroadcast(child: Expression,
                                 bc: org.apache.spark.broadcast.Broadcast[Array[Long]],
                                 keep: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_filter_broadcast requires ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_filter_broadcast"

  @transient private lazy val set: Array[Long] = bc.value

  override def nullSafeEval(v: Any): Any =
    HashFunctions.sortedFilterKernel(v.asInstanceOf[ArrayData], set, keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("sfbBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val arr = ctx.addMutableState("long[]", "sfbSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($arr == null) { $arr = (long[]) $bcRef.value(); }
         |${ev.value} = graft.functions.HashFunctions.sortedFilterKernel($c, $arr, $keep);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** Allocation-bounded two-pointer kernel behind [[SortedFilterBroadcast]]:
    * both sides sorted ascending; emits `a ∩ set` (keep) or `a \ set`
    * (drop) in input order.
    */
  def sortedFilterKernel(a: ArrayData, set: Array[Long], keep: Boolean): ArrayData = {
    val na = a.numElements()
    val buf = new Array[Long](na)
    var i = 0; var j = 0; var n = 0
    while (i < na) {
      val x = a.getLong(i)
      while (j < set.length && set(j) < x) j += 1
      val hit = j < set.length && set(j) == x
      if (hit == keep) { buf(n) = x; n += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (n == na) buf else java.util.Arrays.copyOf(buf, n))
  }

  /** `a ∩ bc` / `a \ bc` Column over a sorted ARRAY<BIGINT> column and a
    * broadcast sorted long array.
    */
  def sortedFilterBroadcast(a: Column,
                            bc: org.apache.spark.broadcast.Broadcast[Array[Long]],
                            keep: Boolean): Column =
    ColumnBridge.column(SortedFilterBroadcast(ColumnBridge.expression(a), bc, keep))

  /** Minhash signature Column over an ARRAY<BIGINT> shingle-id column. */
  def minhashSignature(shingles: Column, aConsts: Seq[Long], bConsts: Seq[Long],
                       prime: Long): Column =
    ColumnBridge.column(
      MinhashSignature(ColumnBridge.expression(shingles), aConsts, bConsts, prime))

  /** In-row 60-bit SimHash Column over an ARRAY<STRING> word column. */
  def simhashBits(words: Column): Column =
    ColumnBridge.column(SimhashBits(ColumnBridge.expression(words)))

  /** |a ∩ b| (BIGINT) over two sorted distinct ARRAY<BIGINT> columns. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
