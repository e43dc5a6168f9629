package graft

/** Registry for literal-inlined trained-model oracle SQL.
  *
  * Operators whose plans bake in trained constants (PQ codebooks, OPQ
  * rotations, logistic-regression weights) stash an equivalent DuckDB
  * query here as they run — the trained arrays are deterministic
  * (bounded seeded samples, fixed-count sequential-fold training), so
  * every run rebuilds bit-identical values and the SQL can inline them
  * as literals. [[SparkEntry.oracleSql]] reads the stash (via
  * `trainedOracles`) AFTER Verify's query loop, so the driver's DuckDB
  * gate independently re-runs the trained model against the same
  * tables.
  */
object OracleStash {
  private val stash = scala.collection.concurrent.TrieMap.empty[String, String]

  def put(key: String, sql: String): Unit = stash.put(key, sql)
  def get(key: String): Option[String] = stash.get(key)

  /** Double literal DuckDB types as DOUBLE (the exponent forces it) and
    * parses back to the identical IEEE value (shortest-round-trip string).
    */
  def dl(x: Double): String = {
    val s = x.toString
    if (s.contains("E")) s else s + "E0"
  }
  def dlist(a: Seq[Double]): String = a.map(dl).mkString("[", ", ", "]")
}
