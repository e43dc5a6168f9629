package graft

import org.apache.spark.sql.functions._

import graft.operators.{ChatStats, EventSemantics, Similarity}
import graft.sources.RollupWarehouse

/** The maintained-MV warehouse flow end-to-end: bootstrap job → incremental
  * refresh job → a SEPARATE session of the same warehouse answers the
  * overlap/attrition/similarity queries off the catalog table with no fact
  * scan, and the bucketed layout keeps the matrix self-join exchange-free.
  */
class WarehouseFlowSpec extends SparkSpec {

  test("bootstrap + incremental refresh + cross-session consumers off the bucketed catalog table") {
    val events = Tables.events(spark, sfDir)
    val cutoff = to_date(lit("2024-01-20"))
    try {
      // fact-scan expectations computed FIRST (before any warehouse write)
      // so no plan resolved against a pre-refresh file listing survives
      // into the post-refresh reads
      val attExpected = ChatStats.attrition(events).collect().map(_.toString).sorted
      val simExpected = Similarity.channelSimilarity(events).collect().map(_.toString).sorted
      val recExpected = Similarity.recommend(events).collect().map(_.toString).sorted
      val full = EventSemantics.userWeeklyActivity(events)

      // --- scheduled-job shape: bootstrap on history, refresh with the delta
      RollupWarehouse.bootstrap(events.filter(col("ts") < cutoff), buckets = 4)
      RollupWarehouse.refresh(spark, events.filter(col("ts") >= cutoff), buckets = 4)

      // --- "next session" of the same warehouse: fresh session state,
      // shared catalog — exactly the multi-session MV contract
      val s2 = spark.newSession()
      val mv = RollupWarehouse.activity(s2)

      // the maintained table equals the full-scan rollup (additive merge)
      assert(mv.exceptAll(full).count() == 0 && full.exceptAll(mv).count() == 0)

      // attrition through the catalog: NO events scan anywhere in the plan
      val att = RollupWarehouse.attrition(s2)
      val attPlan = att.queryExecution.executedPlan.toString
      assert(!attPlan.contains("events.parquet"),
        s"catalog-routed attrition still scans the fact table:\n$attPlan")
      assert(att.collect().map(_.toString).sorted.sameElements(attExpected))

      // matrix through the catalog: the self-join reads co-partitioned
      // buckets — zero non-broadcast exchanges on its user_id inputs
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val matrix = RollupWarehouse.commonUsersMatrix(s2)
      val mPlan = matrix.queryExecution.executedPlan.toString
      val joinInputShuffles = mPlan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning") && l.contains("user_id"))
      assert(joinInputShuffles == 0,
        s"matrix self-join off the maintained table still shuffles:\n$mPlan")
      assert(!mPlan.contains("events.parquet"))
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", (50 * 1024 * 1024).toString)

      // similarity + recommendations also answer off the MV, matching the
      // fact-scan operators row-for-row
      assert(RollupWarehouse.channelSimilarity(s2).collect().map(_.toString).sorted
        .sameElements(simExpected))
      assert(RollupWarehouse.recommend(s2).collect().map(_.toString).sorted
        .sameElements(recExpected))
    } finally {
      // materializing executed plans above can leave detached async jobs
      // (broadcast-exchange futures) still scanning the table — let them
      // quiesce before the files vanish, or they die FAILED_READ_FILE
      val tracker = spark.sparkContext.statusTracker
      val deadline = System.currentTimeMillis + 30000
      while (tracker.getActiveJobIds.nonEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      spark.sql(s"DROP TABLE IF EXISTS ${RollupWarehouse.Table}")
      spark.sql(s"DROP TABLE IF EXISTS ${RollupWarehouse.Table}_staging")
      spark.catalog.clearCache()
    }
  }

  test("userData MV: bootstrap + incremental refresh, membership answered off the catalog") {
    val events = Tables.events(spark, sfDir)
    val cutoff = to_date(lit("2024-01-20"))
    try {
      val expected = ChatStats.membershipSummary(events).collect().map(_.toString).sorted
      val countsExpected = ChatStats.membershipCounts(events, "2024-01-15")
        .collect().map(_.toString).sorted

      RollupWarehouse.bootstrapUserData(events.filter(col("ts") < cutoff), buckets = 4)
      RollupWarehouse.refreshUserData(spark, events.filter(col("ts") >= cutoff), buckets = 4)

      val s2 = spark.newSession()
      // maintained MV equals the full-scan userData build
      val mv = s2.table(RollupWarehouse.UserDataTable)
      val full = EventSemantics.userData(events)
      assert(mv.exceptAll(full).count() == 0 && full.exceptAll(mv).count() == 0)

      // membership family answers off the catalog with no fact scan
      val summary = RollupWarehouse.membershipSummary(s2)
      assert(!summary.queryExecution.executedPlan.toString.contains("events.parquet"))
      assert(summary.collect().map(_.toString).sorted.sameElements(expected))
      assert(RollupWarehouse.membershipCounts(s2, "2024-01-15")
        .collect().map(_.toString).sorted.sameElements(countsExpected))
    } finally {
      val tracker = spark.sparkContext.statusTracker
      val deadline = System.currentTimeMillis + 30000
      while (tracker.getActiveJobIds.nonEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      spark.sql(s"DROP TABLE IF EXISTS ${RollupWarehouse.UserDataTable}")
      spark.sql(s"DROP TABLE IF EXISTS ${RollupWarehouse.UserDataTable}_staging")
      spark.catalog.clearCache()
    }
  }

  test("clustering MV: bootstrap + incremental refresh; state matches the monolithic build; assignment off the catalog") {
    val emb = Tables.embeddings(spark, sfDir)
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      val delta = emb.filter(pmod(col("vec_id"), lit(2)) === 1)

      // scheduled-job shape: bootstrap on the base partition, refresh with
      // the delta — every increment assigns against the FROZEN centroids
      RollupWarehouse.bootstrapKmeans(base, k = 4, iters = 2)
      RollupWarehouse.refreshKmeans(spark, delta)

      // "next session": the maintained state equals a monolithic build of
      // the FULL corpus against the same frozen centroids, bit-exactly
      val s2 = spark.newSession()
      val cent = RollupWarehouse.storedCentroids(s2)
      assert(cent.length == 4 && cent.forall(_.length == 64))
      def explodeSorted(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Vectors.kmeansStateExploded(df).collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .sortBy(t => (t._1, t._2))
      val maintained = explodeSorted(s2.table(RollupWarehouse.KmeansStateTable))
      val monolithic = explodeSorted(graft.operators.Vectors.kmeansState(emb, cent))
      assert(maintained.toSeq == monolithic.toSeq)

      // catalog-backed assignment: no training jobs, covers every valid
      // vector, and agrees with the state the warehouse maintains
      val assigned = RollupWarehouse.clusterAssign(s2, emb).collect()
        .map(r => r.getLong(0) -> r.getInt(1))
      assert(assigned.length == emb.filter(graft.operators.Vectors.kmValid).count())
      val sizes = assigned.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val stateN = s2.table(RollupWarehouse.KmeansStateTable).collect()
        .map(r => r.getInt(0) -> r.getLong(2)).toMap
      assert(sizes == stateN,
        "per-cluster assignment counts must equal the maintained state's n")
    } finally {
      val tracker = spark.sparkContext.statusTracker
      val deadline = System.currentTimeMillis + 30000
      while (tracker.getActiveJobIds.nonEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      Seq(RollupWarehouse.KmeansStateTable, RollupWarehouse.KmeansStateTable + "_staging",
        RollupWarehouse.KmeansCentroidTable).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }

  test("sketch MV: incremental refresh through the catalog, matrix answered with zero fact access") {
    val events = Tables.events(spark, sfDir)
    val cutoff = to_date(lit("2024-01-20"))
    try {
      val expected = ChatStats.commonUsersMatrixApprox(events).collect()
        .map(_.toString).sorted

      RollupWarehouse.bootstrapSketches(events.filter(col("ts") < cutoff), buckets = 2)
      RollupWarehouse.refreshSketches(spark, events.filter(col("ts") >= cutoff), buckets = 2)

      val s2 = spark.newSession()
      val matrix = RollupWarehouse.commonUsersMatrixApprox(s2)
      // zero fact access: only the sketch table is scanned
      assert(!matrix.queryExecution.executedPlan.toString.contains("events.parquet"))
      // sketches survive the parquet round-trip and the incremental union:
      // estimates equal the one-shot build over the full history
      assert(matrix.collect().map(_.toString).sorted.sameElements(expected))
    } finally {
      val tracker = spark.sparkContext.statusTracker
      val deadline = System.currentTimeMillis + 30000
      while (tracker.getActiveJobIds.nonEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      spark.sql(s"DROP TABLE IF EXISTS ${RollupWarehouse.SketchTable}")
      spark.sql(s"DROP TABLE IF EXISTS ${RollupWarehouse.SketchTable}_staging")
      spark.catalog.clearCache()
    }
  }

  test("kNN-graph MV: bootstrap to a bucketed catalog table, maintained scan equals the monolithic graph") {
    import graft.operators.Vectors
    import graft.sources.KnnGraphWarehouse
    val emb = Tables.embeddings(spark, sfDir)
    val old = emb.filter(col("vec_id") % 10 < 8)
    val delta = emb.filter(col("vec_id") % 10 >= 8)
    try {
      KnnGraphWarehouse.bootstrap(old, buckets = 4)
      // the stored table is the bootstrap graph, bucketed by label
      val stored = spark.table(KnnGraphWarehouse.GraphTable)
      assert(stored.columns.toSet ==
        Set("label", "vec_a", "vec_b", "cosine", "nn_rank"))
      assert(stored.count() == Vectors.knnGraph(old).count())
      // maintenance over the SCAN == the monolithic full-corpus graph
      val maintained = KnnGraphWarehouse.maintained(spark, old, delta)
        .collect().map(_.toString).sorted
      val monolithic = Vectors.knnGraph(emb)
        .collect().map(_.toString).sorted
      assert(maintained.sameElements(monolithic))
      // idempotent bootstrap: same input plan in-session skips the rebuild
      KnnGraphWarehouse.bootstrap(old, buckets = 4)
      assert(spark.table(KnnGraphWarehouse.GraphTable).count() == stored.count())
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${KnnGraphWarehouse.GraphTable}")
    }
  }
}
