package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Degenerate-input robustness: empty relations and pathological documents
  * must flow through every operator family without throwing — the oracle
  * gate never exercises these, but a 100 TB run WILL contain an empty
  * partition, an empty document, and a whitespace-only document.
  */
class EdgeCaseSpec extends SparkSpec {

  private lazy val emptyEvents = Tables.events(spark, sfDir).limit(0)
  private lazy val emptyDocs = Tables.documents(spark, sfDir).limit(0)

  private lazy val weirdDocs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "", "en", "src0"),
      (2L, "   ", "en", "src0"),
      (3L, "x", "de", "src1"),
      (4L, "one two", "fr", "src1"),
      (5L, "\tword\n\nword\t ", "es", "src2"))
      .toDF("doc_id", "text", "lang", "source")
  }

  test("requireUtcSession accepts every fixed zero-offset spelling, rejects the rest") {
    val key = "spark.sql.session.timeZone"
    val saved = spark.conf.get(key)
    try {
      // fixed zero-offset spellings Spark accepts — all must pass
      Seq("UTC", "Etc/UTC", "Etc/GMT", "GMT", "GMT0", "Z", "+00:00", "UTC+00:00")
        .foreach { tz =>
          spark.conf.set(key, tz)
          EventSemantics.requireUtcSession(emptyEvents, "spec")
        }
      // non-zero or non-fixed offsets (Europe/London is UTC only part of
      // the year) — all must fail at plan build
      Seq("America/New_York", "Europe/London", "+01:00").foreach { tz =>
        spark.conf.set(key, tz)
        intercept[IllegalArgumentException] {
          EventSemantics.requireUtcSession(emptyEvents, "spec")
        }
      }
    } finally spark.conf.set(key, saved)
  }

  test("rollup-family operators return zero rows on empty events") {
    assert(EventSemantics.userWeeklyActivity(emptyEvents).count() == 0)
    assert(ChatStats.leaderboard(emptyEvents).count() == 0)
    assert(ChatStats.engagement(emptyEvents).count() == 0)
    assert(ChatStats.membershipSummary(emptyEvents).count() == 0)
    assert(ChatStats.attrition(emptyEvents).count() == 0)
    assert(Similarity.channelSimilarity(emptyEvents).count() == 0)
    assert(Similarity.clusteringCommunities(emptyEvents).count() == 0)
    assert(Similarity.leidenCommunities(emptyEvents).count() == 0)
    assert(ChatStats.membershipCounts(emptyEvents, "2024-01-15").count() == 0)
    assert(ChatStats.sketchRollup(emptyEvents).count() == 0)
    assert(ChatStats.commonUsersMatrixApprox(emptyEvents).count() == 0)
    assert(EventSemantics.incrementUserData(
      EventSemantics.userData(emptyEvents), emptyEvents).count() == 0)
  }

  test("dedup suite survives an empty corpus") {
    assert(Dedup.dedupExact(emptyDocs).count() == 0)
    assert(Dedup.dedupMinhash(emptyDocs).count() == 0)
    assert(Dedup.dedupSimhash(emptyDocs).count() == 0)
    assert(Dedup.dedupClusters(emptyDocs).count() == 0)
  }

  test("pipeline ops survive an empty corpus") {
    assert(Pipeline.decontaminate(emptyDocs, graft.Fixtures.evalPrompts(emptyDocs)).count() == 0)
    assert(Pipeline.repetitionScore(emptyDocs).count() == 0)
    assert(Pipeline.sampleStratified(emptyDocs).count() == 0)
    assert(Pipeline.packSequences(emptyDocs).count() == 0)
    assert(Pipeline.unigramNll(emptyDocs).count() == 0)
    assert(Pipeline.corpusBuild(emptyDocs).count() == 0)
  }

  test("text + pipeline ops handle empty/whitespace/single-char documents") {
    // every doc must come back scored, no exceptions, no NaN/nulls in
    // non-null columns
    val rep = Pipeline.repetitionScore(weirdDocs).collect()
    assert(rep.length == 5)
    rep.foreach(r => assert(!r.anyNull && !r.getDouble(3).isNaN))

    val qual = TextOps.qualityDocs(weirdDocs).collect()
    assert(qual.length == 5)
    qual.foreach(r => assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))

    val pack = Pipeline.packSequences(weirdDocs).collect()
    assert(pack.length == 5)

    val decon = Pipeline.decontaminate(weirdDocs, graft.Fixtures.evalPrompts(weirdDocs)).collect()
    assert(decon.length == 5)
    decon.foreach(r => assert(!r.getBoolean(2) || r.getLong(1) > 0))

    // dedup input canonicalizes "" and "   " to the same empty text —
    // they must form one exact-dup group, not crash the shingle pipeline
    val exact = Dedup.dedupExact(weirdDocs).collect()
    assert(exact.nonEmpty)
    val mh = Dedup.dedupMinhash(weirdDocs)
    assert(mh.count() >= 0) // must evaluate; too-short docs simply have no shingles
  }

  test("new round-2 ops survive empty and pathological corpora") {
    assert(Dedup.dedupLines(emptyDocs).count() == 0)
    assert(Pipeline.bigramNll(emptyDocs).count() == 0)
    // single-token and empty docs have no bigrams; whitespace-only docs
    // must not produce ghost tokens
    val s = spark
    import s.implicits._
    val blank = Seq((1L, "", "en", "s"), (2L, "solo", "en", "s"), (3L, "a b", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val nll = Pipeline.bigramNll(blank).collect()
    assert(nll.map(_.getLong(0)).toSet == Set(3L), "only the 2-token doc has a bigram")
    // dedupLines on pathological docs: every input doc_id comes back,
    // counts are consistent
    val dl = Dedup.dedupLines(weirdDocs).collect()
    assert(dl.length == weirdDocs.count())
    dl.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2))
    }
  }

  test("unigramNll on whitespace-only corpus yields no rows rather than dividing by zero") {
    val s = spark
    import s.implicits._
    val blank = Seq((1L, "", "en", "s"), (2L, "  \t ", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    assert(Pipeline.unigramNll(blank).count() == 0)
  }

  // ---- r8-review degenerate-text contracts (engine-vs-oracle parity) -------

  test("charEntropy scores empty AND null text as (0, 0.0) — the oracle's contract") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, ""), (2L, null: String), (3L, "aab"))
      .toDF("doc_id", "text")
    val out = TextOps.charEntropyDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((0L, 0d)), s"empty text: ${out(1L)}")
    assert(out(2L) == ((0L, 0d)), s"null text: ${out(2L)}")
    // sanity on real text: 3 chars, H = -(2/3)ln(2/3) - (1/3)ln(1/3)
    val h = -(2d / 3) * math.log(2d / 3) - (1d / 3) * math.log(1d / 3)
    assert(out(3L) == ((3L, math.floor(h * 1e4) / 1e4)))
  }

  test("contentSimilarity excludes blank docs from the vocabulary (no empty-string term)") {
    val s = spark
    import s.implicits._
    // two blank sources would score similarity 1.0 through the "" term if
    // the Spark tokenizer diverged from the oracle's regexp_extract_all
    val docs = Seq(
      (1L, "", "en", "blankA"), (2L, "   ", "en", "blankB"),
      (3L, "shared words here", "en", "realA"), (4L, "shared words too", "en", "realB"))
      .toDF("doc_id", "text", "lang", "source")
    val sims = Similarity.contentSimilarity(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(!sims.keySet.exists { case (a, b) => a.startsWith("blank") || b.startsWith("blank") },
      s"blank sources must be absent from the similarity graph: ${sims.keySet}")
    assert(sims.contains(("realA", "realB")))
  }

  test("PQ family drops invalid embedding rows on the engine side like the oracle src CTE") {
    val s = spark
    import s.implicits._
    val dim = 64
    def vec(seed: Int): Array[Float] = Array.tabulate(dim)(i => (seed * 31 + i).toFloat / dim)
    val rows = (0L to 20L).map(i => (i, i.toInt % 3, vec(i.toInt))) :+
      ((99L, 0, null: Array[Float])) :+ ((98L, 1, Array.fill(3)(1f)))
    val emb = rows.toDF("vec_id", "label", "embedding")
    Seq(
      Vectors.annPq(emb, k = 5, rerank = 10),
      Vectors.annPqResidual(emb, k = 5, rerank = 10),
      Vectors.annPqOpq(emb, k = 5, rerank = 10)).foreach { out =>
      val ids = out.collect().map(_.getLong(0)).toSet
      assert(!ids.contains(99L) && !ids.contains(98L),
        s"invalid rows must never be scored: $ids")
      assert(ids.nonEmpty)
    }
  }
}
