package graft

import java.nio.file.{Files, Paths}

/** Degenerate-input robustness: every registered query must run (not
  * throw) against a corpus with the right schemas but ZERO rows — the
  * reference's endpoints on a month with no logs return empty results,
  * and a library operator that crashes on an empty partition of a real
  * warehouse is a paging incident, not a query result.
  *
  * The sweep executes each `SparkEntry.queries` entry against a
  * schema-only copy of the testdata tables and asserts it yields a
  * DataFrame whose collect() succeeds (zero or more rows — fixtures may
  * contribute synthetic rows by design; what matters is no crash from a
  * driver-side first()/head()/percentile on nothing).
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = "/tmp/graft-empty-sf"
    if (!Files.exists(Paths.get(dir, "_DONE"))) {
      // events.parquet is written from the RAW read (nanos-as-long ts)
      // so Tables.events' div-1000 conversion sees the layout it expects
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      Files.createFile(Paths.get(dir, "_DONE"))
    }
    dir
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name survives an all-empty corpus") {
      spark.catalog.clearCache()
      val rows = fn(spark, emptyDir).collect()
      assert(rows != null)
    }
  }
}
