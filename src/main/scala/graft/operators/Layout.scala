package graft.operators

import org.apache.spark.sql.DataFrame

/** Physical-layout utilities for the 100 TB deploy path (SURVEY §4,
  * SCALING.md): bucketing co-locates join/aggregation keys at WRITE time so
  * repeated joins on the key never shuffle at read time.
  *
  * The fact-side relations that every overlap/similarity operator joins on
  * (user_id) and the IVF cell assignment are the intended bucket keys: a
  * corpus written `bucketBy(N, "user_id")` makes the matrix/attrition
  * self-joins exchange-free, and `bucketBy(N, "cell")` makes IVF probes
  * partition-pruned scans. `LayoutSpec` pins the exchange-free plan shape.
  */
object Layout {

  /** Write `df` as a bucketed, in-bucket-sorted table in the session
    * catalog. Readers in any later session of the same warehouse get
    * shuffle-free joins/aggregations on `key` against other tables
    * bucketed the same way (same key, same bucket count).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
