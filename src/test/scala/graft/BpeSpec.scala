package graft

import graft.ml.BpeTokenizer
import graft.operators.{Pipeline, TextOps}

/** Behavioral spec for the learned BPE tokenizer (#111/#112, rows-only by
  * design: iterative training is not SQL-expressible). Pins the trainer
  * against hand-computed merges, Spark-plan ≡ driver-encoder equality,
  * merge-count monotonicity, determinism, and degenerate inputs.
  */
class BpeSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("trainer reproduces hand-computed merges on the classic corpus") {
    // word freqs: low ×5, lower ×2, newest ×6, widest ×3
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest",
      "widest widest widest")
    val merges = BpeTokenizer.train(corpus, 4)
    // pair counts round 1: (l,o)=7, (o,w)=7, (e,s)=9, (s,t)=9, (w,e)=8(lower2,newest6)...
    // best = (e,s) 9 vs (s,t) 9 → tie → lexicographic: ("e","s") < ("s","t")
    assert(merges(0) == "e s")
    // round 2: (es,t) = 6+3 = 9 is the unique top ((l,o)=(o,w)=7, (w,es)=6)
    assert(merges(1) == "es t")
    assert(merges.length == 4)
    // determinism
    assert(BpeTokenizer.train(corpus, 4).toSeq == merges.toSeq)
  }

  test("ranked apply: lowest-rank merge wins regardless of position") {
    val ranks = BpeTokenizer.ranksOf(Array("e s", "es t", "l o", "lo w"))
    assert(BpeTokenizer.encodeWord("lowest", ranks).toSeq == Seq("low", "est"))
    assert(BpeTokenizer.encodeWord("stes", ranks).toSeq == Seq("s", "t", "es"))
    // unseen chars stay single symbols
    assert(BpeTokenizer.encodeWord("xyz", ranks).toSeq == Seq("x", "y", "z"))
  }

  test("Spark BpeEncode expression equals the driver encoder on real docs") {
    val s = spark
    import s.implicits._
    val sample = docs.select("doc_id", "text").orderBy("doc_id").limit(256)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val merges = BpeTokenizer.train(sample.map(_._2).toSeq, 64)
    val ranks = BpeTokenizer.ranksOf(merges)
    val sparkSide = sample.map(_._1).toSeq.toDF("doc_id")
      .join(docs, "doc_id")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.TokenizerFunctions.bpeEncode(
          org.apache.spark.sql.functions.col("text"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    sample.foreach { case (id, text) =>
      assert(sparkSide(id) == BpeTokenizer.encode(text, ranks).toList, s"doc $id")
    }
  }

  test("more merges → per-doc token counts never increase; zero merges = chars") {
    def counts(nm: Int): Map[Long, Long] =
      TextOps.tokenizeBpe(docs, numMerges = nm, sampleCap = 256).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c0 = counts(0); val c32 = counts(32); val c128 = counts(128)
    assert(c0.keySet == c32.keySet && c32.keySet == c128.keySet)
    c32.foreach { case (id, n) => assert(n <= c0(id) && c128(id) <= n, s"doc $id") }
    assert(c128.values.sum < c0.values.sum) // merges actually fired
  }

  test("leftmost-single-merge reaches encodeWord's fixpoint (the DuckDB oracle's loop)") {
    // The t_tokenize_bpe oracle replays BPE in a recursive CTE that merges
    // ONE leftmost occurrence of the lowest-rank pair per step, relying on:
    // any rule whose symbol was born from merge r has rank > r, so the
    // best rank cannot drop mid-pass and leftmost-single order = mergeAll
    // order. This pins that equivalence in Scala against the same encoder.
    def leftmostSingle(w: String, merges: Array[String]): List[String] = {
      val ranks = merges.zipWithIndex.toMap
      var syms = w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp)))
      var done = false
      while (!done) {
        val best = syms.zip(syms.drop(1)).iterator
          .flatMap { case (a, b) => ranks.get(a + " " + b).map(r => (r, a, b)) }
          .minByOption(_._1)
        best match {
          case None => done = true
          case Some((_, a, b)) =>
            val j = syms.zip(syms.drop(1)).indexWhere { case (x, y) => x == a && y == b }
            syms = syms.take(j) ::: List(a + b) ::: syms.drop(j + 2)
        }
      }
      syms
    }
    // trained table over real docs: every distinct word must agree
    val sample = docs.select("text").orderBy("doc_id").limit(256)
      .collect().map(_.getString(0))
    val merges = BpeTokenizer.train(sample.toSeq, 64)
    val ranks = BpeTokenizer.ranksOf(merges)
    val words = sample.flatMap(BpeTokenizer.words).distinct
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(leftmostSingle(w, merges) == BpeTokenizer.encodeWord(w, ranks).toList, s"word '$w'")
    }
    // adversarial shapes: repeated runs, chained merges, self-similar pairs
    val crafted = Array("a a", "aa a", "b c", "a b", "ab c")
    val cranks = BpeTokenizer.ranksOf(crafted)
    Seq("aaaa", "aaaaa", "abcabc", "aabbcc", "abababab", "aabcaabc").foreach { w =>
      assert(leftmostSingle(w, crafted) == BpeTokenizer.encodeWord(w, cranks).toList, s"word '$w'")
    }
  }

  test("bpeTrain emits the rank-ordered merge table; stops when nothing repeats") {
    val table = Pipeline.bpeTrain(docs, numMerges = 32, sampleCap = 256).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(table.length == 32)
    assert(table.map(_._1).toSeq == (0 until 32))
    table.foreach { case (_, l, r, tok) => assert(tok == l + r) }

    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text") // no pair repeats
    assert(Pipeline.bpeTrain(tiny, 8).collect().isEmpty)
  }
}
