package graft

import org.apache.spark.sql.functions._

import graft.ml.QualityClassifier
import graft.operators.TextOps

/** Behavioral spec for the learned quality classifier (rows-only by design:
  * LR training is not SQL-expressible). Pins planted-spam separation on the
  * fixture corpus, driver/Spark feature-hash identity, determinism, and the
  * neutral empty-sample model.
  */
class QualityClassifierSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("feature hash: driver-side bucket matches the in-plan md5 formula exactly") {
    val s = spark
    import s.implicits._
    val terms = Seq("hello", "買います", "クリック", "x", "a b", "1234567890", "Ω≈ç√")
    val sparkSide = terms.toDF("t")
      .select(expr("CAST(CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % 1024 AS INT)"))
      .collect().map(_.getInt(0))
    val driverSide = terms.map(QualityClassifier.bucket(_, 1024))
    assert(sparkSide.toSeq == driverSide)
  }

  test("classifier separates planted spam from clean docs; deterministic") {
    val res = TextOps.qualityClassifier(
      Fixtures.qualityCorpus(docs), Fixtures.qualityLabels(docs)).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(res.length == docs.count())
    val (spam, clean) = res.partition(_._1 % 7 == 0)
    assert(spam.nonEmpty && clean.nonEmpty)
    // every planted-spam doc must be flagged junk — the markers are the
    // strongest signal in the corpus and all spam docs carry them verbatim
    spam.foreach { case (id, score, q) =>
      assert(!q && score < 0.5, s"spam doc $id scored $score")
    }
    // clean docs overwhelmingly score quality (a natural doc can collide
    // with marker hash buckets, so demand >= 95%, not 100%)
    val cleanOk = clean.count(_._3)
    assert(cleanOk.toDouble / clean.length >= 0.95,
      s"only $cleanOk/${clean.length} clean docs scored quality")
    // flags agree with scores
    res.foreach { case (_, score, q) => assert(q == (score >= 0.5)) }
    // deterministic end-to-end (training + scoring)
    val again = TextOps.qualityClassifier(
      Fixtures.qualityCorpus(docs), Fixtures.qualityLabels(docs)).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(res.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("empty labeled sample yields the neutral model (every doc scores 0.5)") {
    val noLabels = Fixtures.qualityLabels(docs).filter(lit(false))
    val res = TextOps.qualityClassifier(docs, noLabels).collect()
    assert(res.length == docs.count())
    res.foreach { r => assert(r.getDouble(1) == 0.5 && r.getBoolean(2)) }
  }

  test("train: planted separable sample converges to confident separation") {
    val good = (1 to 40).map(i => (s"the quick brown fox number $i jumps high", 1d))
    val bad = (1 to 40).map(i => (s"buy now click here offer $i free prize", 0d))
    val (w, b) = QualityClassifier.train(good ++ bad, 256)
    def score(t: String): Double = {
      val tk = QualityClassifier.tokens(t)
      val z = b + tk.map(x => w(QualityClassifier.bucket(x, 256))).sum / tk.length
      1d / (1d + math.exp(-z))
    }
    assert(score("the quick brown fox likes to jumps") > 0.9)
    assert(score("click here for a free offer") < 0.1)
  }
}
