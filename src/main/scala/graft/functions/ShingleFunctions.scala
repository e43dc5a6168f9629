package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd fused shingle-id kernel: sliding k-gram over a word array →
  * distinct 60-bit md5 ids, in ONE compiled pass.
  *
  * Replaces the `array_distinct(transform(filter(transform(sequence(...),
  * i -> array_join(slice(w, i, k), ' ')), s -> length(s) > 0), s ->
  * conv(substring(md5(s),1,15),16,10)))` higher-order-function chain shared
  * by decontamination (graft.operators.Pipeline) and the dedup suite
  * (graft.operators.Dedup). Spark does not codegen higher-order functions —
  * that chain runs interpreted per row AND materializes every intermediate
  * shingle string/array; at sf0.1 it was the single largest CPU center of
  * the honest bench (~12 s of 86 s), and per-row CPU is the deploy cost at
  * 100 TB. This expression hashes word bytes directly (one MessageDigest,
  * reset per shingle; a space byte between words ≡ md5 of the
  * space-joined string since UTF-8 concatenation is byte concatenation),
  * so no shingle string is ever allocated.
  *
  * Semantics are IDENTICAL to the HOF chain (pinned elementwise in
  * ExpressionPropertySpec):
  *   - fewer than k words → empty array;
  *   - zero-length shingles are skipped (reachable only at k=1: for k≥2
  *     the k−1 joining spaces make the length positive);
  *   - the id is the first 60 md5 bits read big-endian — exactly
  *     `conv(substring(md5(s), 1, 15), 16, 10)` (same extraction as
  *     [[SimhashBits]], gate-proven);
  *   - `sorted=false` → first-occurrence order (= `array_distinct`);
  *     `sorted=true` → ascending (= `array_sort(array_distinct(…))`).
  *
  * Null array propagates null (callers coalesce split(NULL) to an empty
  * array upstream, preserving the HOF chain's []-on-null behavior).
  */
case class ShingleIds(child: Expression, k: Int, sorted: Boolean)
    extends UnaryExpression {

  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_ids requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_ids"

  override def nullSafeEval(v: Any): Any =
    ShingleIds.compute(v.asInstanceOf[ArrayData], k, sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the md5 loop lives in a compiled helper; codegen keeps the call site
    // inside the whole-stage pipeline (no interpreted expression fallback)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleIds.compute($c, $k, $sorted);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleIds {
  // MessageDigest is not thread-safe and getInstance allocates (provider
  // lookup + digest state) — at one compute() per ROW that allocation is
  // hot-path at 100 TB, so each executor task thread reuses one instance
  // (reset() between shingles already restores a clean state)
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and codegen. */
  def compute(arr: ArrayData, k: Int, sorted: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // word bytes fetched once per word, not once per shingle membership
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      wb(i) = if (w == null) Array.emptyByteArray else w.getBytes
      i += 1
    }
    val md = localMd.get()
    val m = n - k + 1
    val out = new Array[Long](m)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    var cnt = 0
    i = 0
    while (i < m) {
      var len = k - 1 // the joining spaces
      var j = 0
      while (j < k) { len += wb(i + j).length; j += 1 }
      if (len > 0) {
        md.reset()
        j = 0
        while (j < k) {
          if (j > 0) md.update(0x20.toByte)
          md.update(wb(i + j))
          j += 1
        }
        val d = md.digest()
        // first 15 hex chars of the md5 = bytes 0-6 plus the high nibble of
        // byte 7, read big-endian — exactly conv(substr(md5, 1, 15), 16, 10)
        var x = 0L
        var b = 0
        while (b < 7) { x = (x << 8) | (d(b) & 0xffL); b += 1 }
        x = (x << 4) | ((d(7) & 0xf0L) >>> 4)
        if (seen.add(x)) { out(cnt) = x; cnt += 1 }
      }
      i += 1
    }
    val res = java.util.Arrays.copyOf(out, cnt)
    if (sorted) java.util.Arrays.sort(res)
    UnsafeArrayData.fromPrimitiveArray(res)
  }
}

/** Codegen'd per-document character-entropy fold:
  * `struct(n_chars BIGINT, raw_h DOUBLE)` over the text in ONE compiled
  * pass — no per-character array is ever materialized.
  *
  * Replaces the `split(text, '') → aggregate(array_distinct(cs), …,
  * (acc, c) -> acc − p·ln p)` chain of t_char_entropy, which (a) runs
  * interpreted (higher-order functions never enter whole-stage codegen)
  * and (b) is O(distinct × length) per document because each distinct
  * char re-scans the char array via `filter`. This fold is one
  * code-point walk plus a frequency map: O(length).
  *
  * Contract (pinned in ExpressionPropertySpec against the HOF chain):
  *   - characters are Unicode code points (split('') semantics);
  *   - n_chars = code-point count; empty text → (0, 0.0);
  *   - raw_h accumulates `acc − p·ln p` over distinct characters in
  *     FIRST-OCCURRENCE order — the same FP addition sequence as the
  *     interpreted `aggregate` over `array_distinct`, so the result is
  *     bit-identical, not merely close.
  *
  * Null text propagates null (the caller coalesces to '' upstream,
  * preserving the operator's (0, 0.0)-on-null contract).
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy_stats requires STRING, got ${other.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("raw_h", DoubleType, nullable = false)))
  override def prettyName: String = "char_entropy_stats"

  override def nullSafeEval(v: Any): Any =
    CharEntropyStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyStats {
  /** Shared by interpreted eval and codegen. */
  def compute(s: UTF8String): InternalRow = {
    if (s.numBytes() == 0) return new GenericInternalRow(Array[Any](0L, 0.0d))
    val str = s.toString
    // LinkedHashMap: iteration below must follow FIRST OCCURRENCE to
    // reproduce the interpreted fold's FP addition order bit-for-bit
    val counts = new java.util.LinkedHashMap[Integer, Array[Int]]()
    var i = 0
    var total = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      total += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
    }
    var h = 0.0d
    val totD = total.toDouble
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / totD
      h -= p * java.lang.Math.log(p)
    }
    new GenericInternalRow(Array[Any](total.toLong, h))
  }
}

/** Codegen'd fused hashed-n-gram bucket counter for the DSIR family:
  * ARRAY<STRING> raw split words → MAP<BIGINT, BIGINT> of
  * (md5-60-bit(gram) mod `buckets`) → occurrence count over the doc's
  * unigrams + bigrams, in ONE compiled pass.
  *
  * Replaces p_dsir's `filter(split(…)) → explode(concat(w, zip_with(
  * slice…, slice…, concat))) → pmod(md5Id(g), B) → groupBy(doc, b).count`
  * pipeline: the HOF chain runs interpreted and materializes every
  * bigram string, and the per-GRAM explode feeds a full exchange whose
  * only purpose is the per-(doc, bucket) pre-count. This kernel hashes
  * gram bytes directly (no gram string is allocated — a bigram is
  * word-bytes + 0x20 + word-bytes, ≡ md5 of the space-joined string) and
  * counts in-row, so the downstream explode emits ≤ min(grams, buckets)
  * rows per doc and the pre-count needs NO exchange at all.
  *
  * Semantics are IDENTICAL to the HOF pipeline (pinned elementwise in
  * ExpressionPropertySpec):
  *   - zero-length words are dropped FIRST (the `filter(…, length > 0)`
  *     step), then bigrams pair adjacent survivors;
  *   - bucket = first 60 md5 bits big-endian mod `buckets` — exactly
  *     `pmod(conv(substring(md5(g),1,15),16,10), B)` ([[ShingleIds]]'
  *     gate-proven extraction; the 60-bit id is non-negative, so % ≡
  *     pmod);
  *   - no words → empty map; map keys follow first occurrence, unigrams
  *     (in word order) before bigrams — deterministic output order.
  *
  * Null array propagates null (callers filter on map size upstream,
  * preserving the HOF chain's null-drop behavior).
  */
case class GramBucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets >= 1, s"bucket count must be >= 1, got $buckets")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_bucket_counts requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)
  override def prettyName: String = "gram_bucket_counts"

  override def nullSafeEval(v: Any): Any =
    GramBucketCounts.compute(v.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramBucketCounts.compute($c, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramBucketCounts {
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and codegen. */
  def compute(arr: ArrayData, buckets: Int): org.apache.spark.sql.catalyst.util.MapData = {
    val n = arr.numElements()
    // compact the non-empty words first — bigrams pair adjacent SURVIVORS,
    // matching the filter-then-zip_with order of the HOF pipeline
    val wb = new Array[Array[Byte]](n)
    var m = 0
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null && w.numBytes() > 0) { wb(m) = w.getBytes; m += 1 }
      i += 1
    }
    val md = localMd.get()
    def bucketOf(a: Array[Byte], b: Array[Byte]): Long = {
      md.reset()
      md.update(a)
      if (b != null) { md.update(0x20.toByte); md.update(b) }
      val d = md.digest()
      var x = 0L
      var k = 0
      while (k < 7) { x = (x << 8) | (d(k) & 0xffL); k += 1 }
      x = (x << 4) | ((d(7) & 0xf0L) >>> 4)
      x % buckets
    }
    // first-occurrence order, unigrams before bigrams (= the HOF concat)
    val counts = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
    def add(b: Long): Unit = {
      val slot = counts.get(b)
      if (slot == null) counts.put(b, Array(1L)) else slot(0) += 1L
    }
    i = 0
    while (i < m) { add(bucketOf(wb(i), null)); i += 1 }
    i = 0
    while (i + 1 < m) { add(bucketOf(wb(i), wb(i + 1))); i += 1 }
    val ks = new Array[Long](counts.size())
    val vs = new Array[Long](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      ks(j) = e.getKey; vs(j) = e.getValue()(0); j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      UnsafeArrayData.fromPrimitiveArray(ks), UnsafeArrayData.fromPrimitiveArray(vs))
  }
}

/** Codegen'd fused per-document n-gram counter for the LM-scoring family:
  * ARRAY<STRING> raw split words → MAP<STRING, BIGINT> of space-joined
  * `n`-gram → occurrence count, in ONE compiled pass.
  *
  * Replaces the `filter(split(…)) → explode(per token/bigram) →
  * groupBy(doc, gram).count` pre-count of the unigram/bigram NLL
  * pipelines: the HOF tokenize chain runs interpreted, and the per-GRAM
  * explode feeds a full exchange whose only purpose is the per-(doc,
  * gram) pre-count. Counting in-row, the pre-count needs NO exchange —
  * the downstream explode emits one row per DISTINCT gram per doc
  * (stopword mass collapses in-row, the strongest possible form of
  * map-side combine), and only the model rollups (gram-keyed, output
  * orders below the corpus) shuffle at all.
  *
  * Semantics are IDENTICAL to the HOF pipeline (pinned elementwise in
  * ExpressionPropertySpec):
  *   - zero-length words are dropped FIRST (the `filter(…, length > 0)`
  *     step), then n-grams slide over adjacent survivors joined by a
  *     single space (tokens are \\s+ splits, so the join is unambiguous);
  *   - fewer than `n` surviving words → empty map;
  *   - map keys follow first-occurrence order — deterministic output.
  *
  * Null array propagates null (callers filter on map size upstream,
  * preserving the HOF chain's null-drop behavior).
  */
case class TokenGramCounts(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"gram order must be >= 1, got $n")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_gram_counts requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "token_gram_counts"

  override def nullSafeEval(v: Any): Any =
    TokenGramCounts.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenGramCounts.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenGramCounts {
  /** Shared by interpreted eval and codegen. */
  def compute(arr: ArrayData, n: Int): org.apache.spark.sql.catalyst.util.MapData = {
    val len = arr.numElements()
    // compact the non-empty words first — grams slide over adjacent
    // SURVIVORS, matching the filter-then-slide order of the HOF pipeline.
    // Values are CLONED: the source UTF8Strings may point into a reused
    // row/batch buffer, and the returned map must own its bytes.
    val ws = new Array[UTF8String](len)
    var m = 0
    var i = 0
    while (i < len) {
      val w = arr.getUTF8String(i)
      if (w != null && w.numBytes() > 0) { ws(m) = w.clone(); m += 1 }
      i += 1
    }
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    val space = UTF8String.fromString(" ")
    i = 0
    while (i + n - 1 < m) {
      var g = ws(i)
      var j = 1
      while (j < n) { g = UTF8String.concat(g, space, ws(i + j)); j += 1 }
      val slot = counts.get(g)
      if (slot == null) counts.put(g, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val ks = new Array[Any](counts.size())
    val vs = new Array[Long](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      ks(j) = e.getKey; vs(j) = e.getValue()(0); j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(ks),
      UnsafeArrayData.fromPrimitiveArray(vs))
  }
}

object ShingleFunctions {
  /** Distinct 60-bit shingle ids (ARRAY<BIGINT>) of the sliding k-grams of
    * an ARRAY<STRING> word column; `sorted=true` sorts ascending.
    */
  def shingleIds(words: Column, k: Int, sorted: Boolean): Column =
    ColumnBridge.column(ShingleIds(ColumnBridge.expression(words), k, sorted))

  /** MAP<BIGINT, BIGINT> hashed uni+bigram bucket counts over an
    * ARRAY<STRING> raw split-word column (see [[GramBucketCounts]]).
    */
  def gramBucketCounts(words: Column, buckets: Int): Column =
    ColumnBridge.column(GramBucketCounts(ColumnBridge.expression(words), buckets))

  /** MAP<STRING, BIGINT> per-doc n-gram counts over an ARRAY<STRING> raw
    * split-word column (see [[TokenGramCounts]]).
    */
  def tokenGramCounts(words: Column, n: Int): Column =
    ColumnBridge.column(TokenGramCounts(ColumnBridge.expression(words), n))

  /** struct(n_chars BIGINT, raw_h DOUBLE) character-entropy fold over a
    * STRING column.
    */
  def charEntropyStats(text: Column): Column =
    ColumnBridge.column(CharEntropyStats(ColumnBridge.expression(text)))
}
