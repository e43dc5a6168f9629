package graft

import org.apache.spark.sql.functions._

/** Invariants of the soak-corpus replication ([[SoakGen]]). These lock the
  * two construction bugs the first sf1 soak surfaced:
  *   1. a doc_id stride that collides with Fixtures.plantedDocs's internal
  *      +1e7/+2e7 planted-copy offsets (duplicate keys downstream), and
  *   2. a text perturbation that leaves replica docs near-duplicates of
  *      their originals (a document PREFIX only shifts word positions, so
  *      nearly all word trigrams survive and the dedup outputs grow
  *      quadratically in the replication factor by construction).
  */
class SoakGenSpec extends SparkSpec {
  private lazy val out = {
    val dir = "/tmp/graft-soak-spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    SoakGen.generate(spark, sfDir, dir, 3)
    dir
  }

  test("every table replicates to factor x rows with unique keys") {
    val ev = spark.read.parquet(s"$out/events.parquet")
    val src = Tables.events(spark, sfDir)
    assert(ev.count() === 3 * src.count())
    assert(ev.select("event_id").distinct().count() === ev.count())
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() === 3 * Tables.documents(spark, sfDir).count())
    assert(docs.select("doc_id").distinct().count() === docs.count())
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    assert(emb.count() === 3 * Tables.embeddings(spark, sfDir).count())
    assert(emb.select("vec_id").distinct().count() === emb.count())
  }

  test("replica customers are NEW channels: c_name stays unique") {
    // c_name is channel identity (videos joins channel = c_name); replica
    // copies sharing a name merge in name-keyed rollups but split in
    // custkey-keyed ones — the second sf1 soak failed q_monthly_hours
    // exactly this way (Spark filters c_custkey=1, oracle joins by name)
    val c = spark.read.parquet(s"$out/customer.parquet")
    assert(c.count() === 3 * spark.read.parquet(s"$sfDir/customer.parquet").count())
    assert(c.select("c_name").distinct().count() === c.count())
  }

  test("replica doc_ids stay clear of the planted-fixture id offsets") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val planted = Fixtures.plantedDocs(docs)
    // planting on the replicated corpus must still produce unique keys
    assert(planted.select("doc_id").distinct().count() === planted.count())
  }

  test("cross-replica docs share no words, within-replica structure intact") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val words = docs.select(col("doc_id"),
      array_distinct(split(lower(trim(col("text"))), "\\s+")).as("w"))
    val orig = words.filter(col("doc_id") < SoakGen.stride)
    val rep1 = words.filter(col("doc_id") >= SoakGen.stride && col("doc_id") < 2 * SoakGen.stride)
      .select((col("doc_id") - SoakGen.stride).as("doc_id"), col("w").as("w1"))
    val joined = orig.join(rep1, "doc_id")
      .select(size(array_intersect(col("w"), col("w1"))).as("shared"),
        (size(col("w")) === size(col("w1"))).as("same_size"))
    val agg = joined.agg(max("shared").as("mx"), min(when(col("same_size"), 1).otherwise(0)).as("sz")).head()
    assert(agg.getInt(0) === 0, "replica words must be disjoint from original words")
    assert(agg.getInt(1) === 1, "per-word tagging must preserve word counts")
  }

  test("scaleLabels gives replicas disjoint label spaces with preserved block sizes") {
    val dir = "/tmp/graft-soak-spec-labels"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    SoakGen.generate(spark, sfDir, dir, 2, scaleLabels = true)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = Tables.embeddings(spark, sfDir)
    val nLabels = base.agg(max(col("label"))).head().getInt(0) + 1
    // replica 1's labels sit exactly one label-space above replica 0's
    val r0 = emb.filter(col("vec_id") < SoakGen.stride)
    val r1 = emb.filter(col("vec_id") >= SoakGen.stride)
    assert(r0.select("label").except(base.select("label")).count() === 0)
    assert(r1.select((col("label") - nLabels).as("label")).except(base.select("label")).count() === 0)
    assert(r0.select("label").intersect(r1.select("label")).count() === 0,
      "replica label spaces must be disjoint")
    // per-label block sizes are preserved LABEL-BY-LABEL: replica 1's
    // label (L + nLabels) must hold exactly as many vectors as replica
    // 0's label L. (An `except` over bare count columns is a SET compare
    // — it would pass any redistribution that preserves the set of
    // distinct sizes, e.g. {10,10,20} -> {10,20,20}.)
    val sizes0 = r0.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sizes1 = r1.groupBy((col("label") - nLabels).cast("int").as("label")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes0.nonEmpty)
    assert(sizes1 === sizes0, "replica block sizes not preserved per label")
  }

  test("embedding rotation preserves the norm") {
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    def norms(lo: Long, hi: Long) = emb
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select((col("vec_id") % SoakGen.stride).as("k"),
        aggregate(col("embedding"), lit(0d), (a, x) => a + x * x).as("n2"))
    val j = norms(0, SoakGen.stride).as("a")
      .join(norms(SoakGen.stride, 2 * SoakGen.stride).as("b"), col("a.k") === col("b.k"))
      .select(abs(col("a.n2") - col("b.n2")).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(j < 1e-3, "cyclic shift must preserve vector norm")
  }
}
