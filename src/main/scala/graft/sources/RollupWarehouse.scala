package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ChatStats, EventSemantics, Layout, Similarity, Vectors}

/** The maintained-MV warehouse flow end-to-end (SURVEY §4 / SCALING.md
  * "Cache lifecycle"): the reference keeps `mv_user_monthly_activity` as a
  * Postgres materialized view refreshed by a monthly procedure
  * (db/queries.py:179, refresh procedures at :120-177); at 100 TB the same
  * discipline is a BUCKETED CATALOG TABLE maintained by a scheduled job —
  * bootstrap once, then per ingest batch aggregate ONLY the new partition
  * and additively merge ([[EventSemantics.incrementRollup]]).
  *
  * Every downstream consumer (attrition, common-users matrix, channel
  * similarity, recommendations) then runs off the catalog table through
  * its `*From` seam: no fact scan at query time at all, and because the
  * table is bucketed by `user_id` (the self-join key of every overlap
  * operator), the pair joins read co-partitioned buckets with NO input
  * exchange — `WarehouseFlowSpec` pins both properties across separate
  * sessions of the same warehouse.
  *
  * Refresh lands the merge in a staging table and rewrites the main
  * table from it (Spark cannot overwrite a table that feeds the plan
  * being written; see [[refresh]] for why not a rename) — the same
  * contract as the reference's transactional REFRESH. Three MVs are
  * maintained this way: the weekly activity rollup, the userData base
  * relation (membership family), and the HLL sketch rollup (the
  * interactive overlap layer).
  */
object RollupWarehouse {

  val Table = "graft_weekly_activity"
  val UserDataTable = "graft_user_data"

  /** Bootstrap job: full-history build of the weekly rollup, bucketed and
    * in-bucket sorted by user_id.
    */
  def bootstrap(events: DataFrame, table: String = Table, buckets: Int = 32): Unit =
    Layout.writeBucketed(
      EventSemantics.userWeeklyActivity(events), table, "user_id", buckets)

  /** Bootstrap the userData MV itself — the relation the whole membership
    * family derives from (the reference's `user_data` table).
    */
  def bootstrapUserData(events: DataFrame, table: String = UserDataTable,
                        buckets: Int = 32): Unit =
    Layout.writeBucketed(EventSemantics.userData(events), table, "user_id", buckets)

  /** Incremental refresh of the userData MV: aggregate only `newEvents`,
    * merge via [[EventSemantics.incrementUserData]] (every aggregate is
    * mergeable), swap through staging like [[refresh]].
    */
  def refreshUserData(spark: SparkSession, newEvents: DataFrame,
                      table: String = UserDataTable, buckets: Int = 32): Unit =
    swapWrite(spark,
      EventSemantics.incrementUserData(spark.table(table), newEvents),
      table, buckets)

  /** Incremental refresh job: aggregate ONLY `newEvents` (days of data,
    * not the 100 TB history) and additively merge into the stored rollup;
    * the bucketed stored side moves through no exchange in the merge.
    *
    * Two-step swap through a staging table: Spark cannot overwrite a
    * table that feeds the plan being written, so the merge lands in
    * staging and the main table is rewritten FROM staging (a rename-swap
    * would be one write cheaper but moves files under a cached listing —
    * readers race FILE_NOT_EXIST; the MV is |user × channel × week|,
    * orders below the corpus, so the second write is noise next to the
    * delta aggregation). `refreshTable` then drops stale metadata for
    * in-flight sessions.
    */
  def refresh(spark: SparkSession, newEvents: DataFrame,
              table: String = Table, buckets: Int = 32): Unit =
    swapWrite(spark,
      EventSemantics.incrementRollup(spark.table(table), newEvents),
      table, buckets)

  private def swapWrite(spark: SparkSession, merged: DataFrame,
                        table: String, buckets: Int, key: String = "user_id"): Unit = {
    val staging = table + "_staging"
    Layout.writeBucketed(merged, staging, key, buckets)
    spark.catalog.refreshTable(staging)
    Layout.writeBucketed(spark.table(staging), table, key, buckets)
    spark.sql(s"DROP TABLE $staging")
    // refreshTable drops this session's cached relation; refreshByPath
    // additionally evicts the SHARED file-status cache, which other
    // sessions of the warehouse would otherwise read a pre-overwrite file
    // listing from (FAILED_READ_FILE on the replaced files)
    spark.catalog.refreshTable(table)
    val loc = spark.sql(s"DESCRIBE FORMATTED $table")
      .filter(col("col_name") === "Location")
      .select("data_type").head().getString(0)
    spark.catalog.refreshByPath(loc)
  }

  /** The maintained rollup as read by any session of the warehouse. */
  def activity(spark: SparkSession, table: String = Table): DataFrame =
    spark.table(table)

  // ---- consumers routed through the catalog table (no fact scan) ----------

  def attrition(spark: SparkSession, topK: Int = 1000, baselineWeeks: Int = 3): DataFrame =
    ChatStats.attritionFrom(activity(spark), topK, baselineWeeks)

  def commonUsersMatrix(spark: SparkSession): DataFrame =
    ChatStats.commonUsersMatrixFrom(
      activity(spark).select("user_id", "channel", "week"))

  def channelSimilarity(spark: SparkSession): DataFrame =
    Similarity.channelSimilarityFrom(activity(spark))

  /** Full-period weights are one aggregation away from the weekly MV
    * (so `refresh` keeps this consumer fresh too).
    */
  def recommend(spark: SparkSession, userId: Long = 3L,
                exclThreshold: Long = 3L, k: Int = 10): DataFrame =
    Similarity.recommendFrom(
      activity(spark).groupBy("user_id", "channel")
        .agg(sum("messages").as("weight")),
      userId, exclThreshold, k)

  def retentionCohort(spark: SparkSession): DataFrame =
    ChatStats.retentionCohortFrom(activity(spark))

  /** The maintained userData MV with the ISO week attached — the input
    * shape of the membership seams.
    */
  def weeklyUserData(spark: SparkSession, table: String = UserDataTable): DataFrame =
    spark.table(table)
      .withColumn("week", to_date(date_trunc("week", col("day"))))

  def membershipSummary(spark: SparkSession): DataFrame =
    ChatStats.membershipSummaryFrom(weeklyUserData(spark))

  def membershipCounts(spark: SparkSession, weekStart: String): DataFrame =
    membershipSummary(spark).filter(col("week") === to_date(lit(weekStart)))

  // ---- sketch MV (the interactive overlap layer) ---------------------------

  val SketchTable = "graft_user_sketches"

  /** Bootstrap the HLL sketch MV: one partial-agg pass over raw events,
    * |channels × weeks| rows of ~10 KB sketches.
    */
  def bootstrapSketches(events: DataFrame, table: String = SketchTable,
                        buckets: Int = 8): Unit =
    Layout.writeBucketed(ChatStats.sketchRollup(events), table, "channel", buckets)

  /** Incremental sketch refresh: sketch ONLY the new partition and union
    * into the stored rows ([[ChatStats.mergeSketchRollups]] — estimates
    * provably equal the full-history build).
    */
  def refreshSketches(spark: SparkSession, newEvents: DataFrame,
                      table: String = SketchTable, buckets: Int = 8): Unit =
    swapWrite(spark,
      ChatStats.mergeSketchRollups(spark.table(table), ChatStats.sketchRollup(newEvents)),
      table, buckets, key = "channel")

  /** The approximate common-users matrix with ZERO fact access — pair
    * math over the maintained sketch rows only.
    */
  def commonUsersMatrixApprox(spark: SparkSession, table: String = SketchTable): DataFrame =
    ChatStats.commonUsersMatrixApproxFrom(spark.table(table))

  // ---- clustering MV (the curation layer's centroid state) -----------------

  val KmeansStateTable = "graft_kmeans_state"
  val KmeansCentroidTable = "graft_kmeans_centroids"

  /** Bootstrap the clustering MV: train centroids on the corpus, store
    * BOTH the frozen assignment basis (centroid table — the contract
    * every later increment assigns against) and the additive per-cluster
    * state (k rows of fixed-point sums).
    */
  def bootstrapKmeans(embeddings: DataFrame, k: Int = 8, iters: Int = 3): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cent = Vectors.trainCentroids(embeddings, k, iters)
    cent.zipWithIndex.map { case (c, j) => (j, c.toSeq) }.toSeq
      .toDF("cluster", "cvec")
      .write.mode("overwrite").saveAsTable(KmeansCentroidTable)
    Layout.writeBucketed(Vectors.kmeansState(embeddings, cent),
      KmeansStateTable, "cluster", 4)
  }

  /** The frozen assignment basis, as any session of the warehouse reads
    * it (cluster-index order).
    */
  def storedCentroids(spark: SparkSession): Array[Array[Double]] =
    spark.table(KmeansCentroidTable).collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)

  /** Incremental refresh: assign ONLY the new partition against the
    * stored frozen centroids and merge the exact fixed-point sums into
    * the stored state — bit-identical to a monolithic rebuild against
    * the same centroids (`Vectors.mergeKmeansState`'s contract). A full
    * retrain + [[bootstrapKmeans]] is the compaction step.
    */
  def refreshKmeans(spark: SparkSession, newEmbeddings: DataFrame): Unit =
    swapWrite(spark,
      Vectors.mergeKmeansState(spark.table(KmeansStateTable),
        Vectors.kmeansState(newEmbeddings, storedCentroids(spark))),
      KmeansStateTable, buckets = 4, key = "cluster")

  /** Assign any relation against the maintained centroids — zero
    * training, zero fact access beyond the scanned relation itself
    * (empty centroid table → empty result, the family contract).
    */
  def clusterAssign(spark: SparkSession, embeddings: DataFrame): DataFrame =
    Vectors.assignClusters(embeddings, storedCentroids(spark))
}
