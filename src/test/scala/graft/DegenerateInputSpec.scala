package graft

import java.nio.file.{Files, Paths}

/** Shared harness for degenerate-corpus sweeps: materialize a reduced
  * copy of every testdata table once, then run EVERY registered query
  * against it and assert collect() succeeds. New `SparkEntry.queries`
  * entries are covered automatically.
  */
abstract class DegenerateInputSpec(dirName: String, rows: Int) extends SparkSpec {

  private lazy val dir: String = {
    val d = s"/tmp/$dirName"
    if (!Files.exists(Paths.get(d, "_DONE"))) {
      // events.parquet is written from the RAW read (nanos-as-long ts)
      // so Tables.events' div-1000 conversion sees the layout it expects
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").limit(rows)
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
