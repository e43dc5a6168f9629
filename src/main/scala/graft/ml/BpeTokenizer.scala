package graft.ml

import scala.collection.mutable

/** Deterministic byte-pair-encoding tokenizer trainer + encoder — the
  * learned rung above the regex token counters in the text suite (the
  * tokenizer-training stage of a training-data build; reference for the
  * role: HoloChatStats tokenizes chat text for its LLM features in
  * `llm_chat/`, out of engine scope — this is the data-pipeline analog).
  *
  * Training is classic character-level BPE over a word-frequency dict
  * (Sennrich et al. 2016): repeatedly merge the most frequent adjacent
  * symbol pair. Deterministic: ties break lexicographically on the pair;
  * iteration order never matters because counts live in sorted maps at
  * the comparison boundary. Encoding is the standard ranked-merge apply:
  * repeatedly merge ALL occurrences of the lowest-rank pair present.
  *
  * Both halves are driver/executor-safe plain Scala — the trainer runs
  * once on a bounded sample (train-once contract), the encoder runs
  * inside whole-stage codegen via [[graft.functions.BpeEncode]].
  */
object BpeTokenizer {

  /** The word convention of the text suite: lowercase, whitespace split.
    * Locale.ROOT so JVM-side tokenization matches Spark SQL's
    * locale-independent `lower()` (tr_TR would map 'I'→'ı' otherwise and
    * break the "identical features" contract with in-row scoring).
    *
    * No Java `String.trim` here: trim strips EVERY char <= U+0020 at the
    * edges (including C0 controls outside the `\s` class, e.g. ),
    * which the DuckDB oracle's regex word split does not — the
    * split+nonEmpty filter already absorbs `\s`-class edges on its own,
    * so both engines see identical edge tokens.
    */
  def words(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  /** Separator joining a merge pair into one ranks-map key. Symbols are
    * born from whitespace-free words, so a space can never occur in one.
    */
  val SEP = " "

  /** Train up to `numMerges` merges; stops early when no pair repeats.
    * Returns merges in rank order, each as `left SEP right`.
    */
  def train(texts: Seq[String], numMerges: Int): Array[String] = {
    val wf = mutable.LinkedHashMap.empty[String, Long]
    texts.foreach(t => words(t).foreach(w => wf.update(w, wf.getOrElse(w, 0L) + 1L)))
    var syms: Array[(Array[String], Long)] =
      wf.iterator.map { case (w, n) => (chars(w), n) }.toArray
    val merges = mutable.ArrayBuffer.empty[String]
    var halt = false
    while (merges.length < numMerges && !halt) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (s, n) =>
        var i = 0
        while (i < s.length - 1) {
          val p = (s(i), s(i + 1)); pc.update(p, pc.getOrElse(p, 0L) + n); i += 1
        }
      }
      // a merge must save something: only pairs seen at least twice
      // qualify. Materialized: an Iterator is unusable after isEmpty.
      val candidates = pc.iterator.filter(_._2 >= 2L).toSeq
      if (candidates.isEmpty) halt = true
      else {
        val (best, _) = candidates.minBy { case ((a, b), n) => (-n, a, b) }
        merges += (best._1 + SEP + best._2)
        syms = syms.map { case (s, n) => (mergeAll(s, best._1, best._2), n) }
      }
    }
    merges.toArray
  }

  /** Initial symbols: one per CODE POINT (not UTF-16 unit — a sheared
    * surrogate pair would not survive the UTF8String boundary).
    */
  private def chars(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Merge every (non-overlapping, left-to-right) occurrence of the pair. */
  private def mergeAll(s: Array[String], a: String, b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** rank lookup keyed `left SEP right`, built once per plan. */
  def ranksOf(merges: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), Integer.valueOf(i)); i += 1 }
    m
  }

  /** Standard ranked BPE apply for one word: while any adjacent pair has a
    * rank, merge all occurrences of the LOWEST-rank pair present.
    */
  def encodeWord(w: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var s: Array[String] = chars(w)
    var done = s.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < s.length - 1) {
        val r = ranks.get(s(i) + SEP + s(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestA = s(i); bestB = s(i + 1)
        }
        i += 1
      }
      if (bestA == null) done = true
      else {
        s = mergeAll(s, bestA, bestB)
        if (s.length < 2) done = true
      }
    }
    s
  }

  /** Encode full text: concatenated per-word token streams. */
  def encode(text: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    words(text).foreach(w => out ++= encodeWord(w, ranks))
    out.toArray
  }
}
