package graft

import java.nio.file.{Files, Paths}

/** Shared harness for degenerate-corpus sweeps: materialize a reduced
  * copy of every testdata table once, then run EVERY registered query
  * against it and assert collect() succeeds. New `SparkEntry.queries`
  * entries are covered automatically.
  */
abstract class DegenerateInputSpec(dirName: String, rows: Int) extends SparkSpec {

  /** Per-table mutation applied before writing the reduced copy. */
  protected def mutate(table: String, df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = df

  private lazy val dir: String = {
    val d = s"/tmp/$dirName"
    if (!Files.exists(Paths.get(d, "_DONE"))) {
      // events.parquet is written from the RAW read (nanos-as-long ts)
      // so Tables.events' div-1000 conversion sees the layout it expects
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        mutate(t, spark.read.parquet(s"$sfDir/$t.parquet").limit(rows))
          .coalesce(1).write.mode("overwrite").parquet(s"$d/$t.parquet")
      }
      Files.createFile(Paths.get(d, "_DONE"))
    }
    d
  }

  protected def describe: String

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name survives $describe") {
      spark.catalog.clearCache()
      val out = fn(spark, dir).collect()
      assert(out != null)
    }
  }
}

/** Every query must run (not crash) on a corpus with the right schemas
  * but ZERO rows — the reference's endpoints on a month with no logs
  * return empty results; a library operator that throws on an empty
  * warehouse partition is a paging incident, not a query result. This
  * sweep caught ANSI divide-by-zero in commonUsersPair, the PQ
  * codebook's empty-sample require, and the multi-probe kNN VOID
  * centroid literal.
  */
class EmptyInputSpec extends DegenerateInputSpec("graft-empty-sf", 0) {
  protected def describe = "an all-empty corpus"
}

/** One row per table: the smallest corpus where aggregation paths run —
  * single-element windows, LAG with no predecessor, percentile of one
  * value, one-vector codebook/centroid training, single-doc dedup.
  */
class SingleRowInputSpec extends DegenerateInputSpec("graft-one-sf", 1) {
  protected def describe = "a one-row-per-table corpus"
}

/** Dirty data: NULLs planted in every column a real warehouse can have
  * them in — document text/lang, dimension names, durations, event
  * values. The reference's parser drops malformed rows at ingest; a
  * library consuming someone ELSE's tables doesn't get that guarantee,
  * so every operator must tolerate nulls (null-safe expressions, null
  * group keys, sum/avg over null) rather than crash.
  */
class NullHeavyInputSpec extends DegenerateInputSpec("graft-nulls-sf", 200) {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  protected def describe = "a corpus with nulls in every nullable column"

  override protected def mutate(table: String, df: DataFrame): DataFrame = table match {
    case "documents" =>
      df.withColumn("text", when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("text")))
        .withColumn("lang", when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("lang")))
        .withColumn("source", when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("source")))
    case "customer" =>
      df.withColumn("c_name", when(col("c_custkey") % 4 === 0, lit(null)).otherwise(col("c_name")))
    case "orders" =>
      df.withColumn("o_totalprice", when(col("o_orderkey") % 6 === 0, lit(null)).otherwise(col("o_totalprice")))
        .withColumn("o_orderdate", when(col("o_orderkey") % 11 === 0, lit(null)).otherwise(col("o_orderdate")))
    case "events" =>
      df.withColumn("value", when(col("user_id") % 5 === 0, lit(null)).otherwise(col("value")))
    case "embeddings" =>
      df.withColumn("label", when(col("vec_id") % 9 === 0, lit(null)).otherwise(col("label")))
    case _ => df
  }
}
