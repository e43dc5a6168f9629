package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** SQL-surface spec: after GraftExtensions.register, every graft function
  * is callable from spark.sql and produces exactly what the DataFrame API
  * produces (same expression trees, so same plans).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("vec_dot and vec_norm2 are callable from SQL and match the Column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<DOUBLE>),
        |               CAST(array(4.0, 5.0, 6.0) AS ARRAY<DOUBLE>)) AS d,
        |       vec_norm2(CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS n2""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 25.0)
    val agg = spark.sql(
      """SELECT vec_sum(v, 2) AS s FROM VALUES
        | (CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>)),
        | (CAST(array(10.0, 20.0) AS ARRAY<DOUBLE>)) AS t(v)""".stripMargin)
      .collect()(0).getSeq[Double](0)
    assert(agg == Seq(11.0, 22.0))
  }

  test("nearest_centroid is callable from SQL with literal centroids") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT nearest_centroid(CAST(array(1.0, 1.0) AS ARRAY<DOUBLE>), 2,
        |  CAST(array(0.0, 0.0, 1.0, 1.0, 5.0, 5.0) AS ARRAY<DOUBLE>)) AS nc""".stripMargin)
      .select("nc.cluster", "nc.dist").collect()(0)
    assert(r.getInt(0) == 1 && r.getDouble(1) == 0.0)
  }

  test("bpe_encode is callable from SQL with a literal merge list") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT bpe_encode('lowest low', array('e s', 'es t', 'l o', 'lo w')) AS t")
      .collect()(0).getSeq[String](0)
    assert(r == Seq("low", "est", "low"))
    // non-literal merges must fail loudly, not silently misbehave
    intercept[Exception] {
      spark.sql("SELECT bpe_encode('x', array(CAST(rand() AS STRING)))").collect()
    }
  }

  test("SQL text functions equal their Column twins on real documents") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    docs.createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_categorize(text) AS cat, graft_lang_id(text) AS lang,
        |       graft_ws_tokens(text) AS toks, graft_quality(text) AS q,
        |       graft_fingerprint(text) AS fp, graft_has_humor(text) AS humor,
        |       graft_simhash(split(text, '\\s+')) AS sh
        |FROM docs_ext""".stripMargin)
    val viaCol = docs.select(
      col("doc_id"),
      TextFunctions.categorize(col("text")).as("cat"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.wsTokenCount(col("text")).as("toks"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.polyFingerprint(col("text")).as("fp"),
      TextFunctions.hasHumor(col("text")).as("humor"),
      graft.functions.HashFunctions.simhashBits(split(col("text"), "\\s+")).as("sh"))
    assert(viaSql.count() > 0)
    assert(viaSql.exceptAll(viaCol).count() == 0)
    assert(viaCol.exceptAll(viaSql).count() == 0)
  }

  test("registerAll makes the whole engine drivable from pure SQL") {
    Tables.registerAll(spark, sfDir)
    val r = spark.sql(
      """SELECT e.label, count(*) AS n, max(vec_norm2(e.embedding)) AS max_n2
        |FROM embeddings e GROUP BY e.label ORDER BY n DESC LIMIT 3""".stripMargin)
      .collect()
    assert(r.length == 3 && r.forall(_.getDouble(2) > 0))
    val docs = spark.sql("SELECT graft_lang_id(text) AS l FROM documents").collect()
    assert(docs.nonEmpty)
  }

  test("the injector class drives a session built WITH the extensions, loaded by name") {
    // exercises the production spark.sql.extensions path for real: the
    // class resolved by NAME via reflection (what Spark's conf mechanism
    // does), zero-arg-constructed, applied at session BUILD — the
    // register(spark) runtime path used by every other test never runs
    // `class GraftExtensions.apply`
    import org.apache.spark.sql.SparkSessionExtensions
    val inst = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    val orig = spark // force the shared session to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(inst)
        .getOrCreate()
      assert(s2 ne orig, "builder returned the old session — extensions not applied")
      // every injected function must resolve and evaluate from pure SQL
      val r = s2.sql(
        "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
          "graft_categorize('hello world') AS c").collect().head
      assert(r.getDouble(0) === 11.0)
      assert(r.getString(1) === "es_en_id")
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("the extensions class injects the same builder list") {
    // pin that the class wires every function in `all`
    val names = GraftExtensions.all.map(_._1)
    assert(names.contains("vec_dot") && names.contains("graft_categorize"))
    assert(names.distinct.size == names.size)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val dot = GraftExtensions.all.toMap.apply("vec_dot")
    val e = dot(Seq(
      ColumnBridge.expression(lit(Array(1.0, 2.0))),
      ColumnBridge.expression(lit(Array(3.0, 4.0)))))
    assert(e.isInstanceOf[graft.functions.DotProduct])
  }
}
