package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed (post-AQE-initial) physical plan of the
  * named SparkEntry queries (args = query names; no args = all), using the
  * same session config as Bench. Pass SPARK_GRAFT_RUN=1 to also execute
  * each query first so AQE's final plan (with runtime reuse/coalesce
  * decisions) is shown instead of the initial one.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val run = sys.env.get("SPARK_GRAFT_RUN").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 50 * 1024 * 1024)
      // mirror Bench's session (see Bench.scala for the measurements)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // full materialization, not count(): a count()-driven "final" plan
      // is the COLUMN-PRUNED one (map-only projections stripped), not the
      // plan Bench/Verify execute
      if (run) Actions.materialize(df)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
      // without a per-query drain, RUN mode over the full registry
      // accumulates every operator's pinned relations and later queries'
      // AQE decisions (and thus printed plans) reflect a distorted memory
      // budget rather than what Bench/Verify actually run
      if (run) { Caches.release(); spark.catalog.clearCache() }
    }
    spark.stop()
  }
}
