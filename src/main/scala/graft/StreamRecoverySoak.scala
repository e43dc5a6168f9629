package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Failure-injection soak for the streaming twins (VERDICT r10 item 4):
  * the CheckpointRecoverySpec suite proves 2-batch stop/restart recovery
  * on MemoryStream fixtures; this main proves the same contract under
  * soak-scale load — a FILE-source stream over the factor-10 soak corpus
  * is KILLED mid-stream (query stopped while unprocessed input remains,
  * after a handful of committed batches), restarted from its checkpoint,
  * run to completion, and the final output compared row-exact against
  * the batch twin over the full corpus:
  *
  *  - `s_stream_dedup` (append mode, parquet FILE sink — the sink whose
  *    `_spark_metadata` manifest is the exactly-once contract a deploy
  *    relies on): after recovery every distinct content hash appears
  *    EXACTLY once (no duplicate emission from the replayed batch, no
  *    loss from the killed one) and the hash set equals the batch
  *    twin's.
  *  - `s_rollup_maintain` (update mode, foreachBatch into an
  *    overwrite-by-batchId parquet layout — the idempotent-sink
  *    discipline update-mode deploys use): the final value per
  *    (user, channel, week) — last batch wins — equals the monolithic
  *    batch rollup exactly, which can only hold if the killed run's
  *    state store was recovered (a state loss would restart counts and
  *    undercount every group straddling the kill).
  *
  * Event-time note: both scenarios deliberately run with a horizon wider
  * than the corpus (dedup watermark 3650 days; rollup unwatermarked) so
  * the comparison is arrival-order-independent — chunked parallel file
  * arrival does not replay in event-time order, and this soak measures
  * RECOVERY exactness, not eviction (StreamSoak's rate phase already
  * measures bounded state under watermark eviction).
  *
  * Writes stream_recovery_soak.json and, when stream_soak.json exists,
  * re-emits it with the recovery section appended under `"recovery"` so
  * the streaming soak artifact carries both phases.
  *
  * Usage: runMain graft.StreamRecoverySoak [corpusDir=target/soak/sf1]
  */
object StreamRecoverySoak {

  private val killAfterBatches = 4

  /** Poll until `n` progress events with committed input, then stop the
    * query mid-stream. Returns (batches committed before the kill,
    * whether unprocessed chunk files remained — i.e. the kill was real).
    */
  private def killAfter(q: StreamingQuery, n: Int, totalChunks: Long): (Long, Boolean) = {
    var committed = 0L
    while (committed < n && q.isActive) {
      Thread.sleep(100)
      committed = q.recentProgress.count(_.numInputRows > 0).toLong
    }
    q.stop()
    q.awaitTermination()
    // chunk files are drained maxFilesPerTrigger per batch; fewer
    // committed batches than chunks/filesPerTrigger means input remained
    val remained = committed * filesPerTrigger < totalChunks
    (committed, remained)
  }

  private val chunks = 40
  private val filesPerTrigger = 2

  private def writeChunked(df: DataFrame, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    df.repartition(chunks).write.parquet(dir)
  }

  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("target/soak/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "target/stream_recovery"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    // ---------- scenario 1: s_stream_dedup, append mode, file sink ----------
    // synthetic ingest time INSIDE the watermark horizon for the whole
    // corpus (see scaladoc): recovery exactness, not eviction
    val docs = Fixtures.plantedDocs(Tables.documents(spark, corpusDir))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + pmod(col("doc_id"), lit(86400L))))
      .select("doc_id", "text", "ts")
    writeChunked(docs, s"$root/in_dedup")
    val docsSchema = spark.read.parquet(s"$root/in_dedup").schema
    def dedupQuery(): StreamingQuery =
      streaming.DedupStream.dedupStream(
          spark.readStream.schema(docsSchema)
            .option("maxFilesPerTrigger", filesPerTrigger.toString)
            .parquet(s"$root/in_dedup"),
          watermark = "3650 days")
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out_dedup")
        .option("checkpointLocation", s"$root/ckpt_dedup")
        .start()
    val (dedupPreKill, dedupMid) = killAfter(dedupQuery(), killAfterBatches, chunks.toLong)
    val q1b = dedupQuery() // restart from the same checkpoint
    q1b.processAllAvailable()
    q1b.stop()
    val sunk = spark.read.parquet(s"$root/out_dedup") // manifest-filtered view
    val emitted = sunk.count()
    val dupHashes = sunk.groupBy("content_hash").count().filter(col("count") > 1).count()
    val expectedHashes = streaming.DedupStream.survivors(docs).count()
    val hashSetDiff = sunk.select("content_hash").distinct()
      .unionByName(docs.select(sha2(lower(trim(col("text"))), 256).as("content_hash")).distinct())
      .groupBy("content_hash").count().filter(col("count") =!= 2).count()
    val dedupPass = dupHashes == 0 && emitted == expectedHashes && hashSetDiff == 0
    println(s"[recovery] s_stream_dedup: killed after $dedupPreKill batches " +
      s"(mid_stream=$dedupMid), emitted=$emitted expected=$expectedHashes " +
      s"dup_hashes=$dupHashes set_diff=$hashSetDiff pass=$dedupPass")

    // ---------- scenario 2: s_rollup_maintain, update mode, foreachBatch ----------
    val events = Tables.events(spark, corpusDir)
    writeChunked(events, s"$root/in_rollup")
    val evSchema = spark.read.parquet(s"$root/in_rollup").schema
    def rollupQuery(): StreamingQuery =
      streaming.RollupStream.maintained(
          spark.readStream.schema(evSchema)
            .option("maxFilesPerTrigger", filesPerTrigger.toString)
            .parquet(s"$root/in_rollup"),
          watermark = None)
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$root/ckpt_rollup")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          // overwrite-by-batchId: a replayed batch rewrites its own
          // directory — the idempotent-sink contract for update mode
          b.write.mode("overwrite").parquet(s"$root/out_rollup/batch=$id")
          ()
        }
        .start()
    val (rollupPreKill, rollupMid) = killAfter(rollupQuery(), killAfterBatches, chunks.toLong)
    val q2b = rollupQuery()
    q2b.processAllAvailable()
    q2b.stop()
    val updates = spark.read.option("basePath", s"$root/out_rollup")
      .parquet(s"$root/out_rollup")
    // within a batch every key appears once (update mode emits one row
    // per updated group per batch)
    val dupInBatch = updates.groupBy("batch", "user_id", "channel", "week")
      .count().filter(col("count") > 1).count()
    // last write wins per key == the recovered final state
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "channel", "week").orderBy(col("batch").desc)
    val finalMv = updates
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "channel", "week", "messages")
    val twin = graft.operators.EventSemantics.userWeeklyActivity(events)
    val mvDiff = finalMv.exceptAll(twin).count() + twin.exceptAll(finalMv).count()
    val rollupPass = dupInBatch == 0 && mvDiff == 0
    println(s"[recovery] s_rollup_maintain: killed after $rollupPreKill batches " +
      s"(mid_stream=$rollupMid), final_mv_rows=${twin.count()} diff=$mvDiff " +
      s"dup_in_batch=$dupInBatch pass=$rollupPass")

    val json =
      s"""{"corpus":"$corpusDir","kill_after_batches":$killAfterBatches,"chunks":$chunks,""" +
        s""""s_stream_dedup":{"pre_kill_batches":$dedupPreKill,"killed_mid_stream":$dedupMid,""" +
        s""""emitted":$emitted,"expected":$expectedHashes,"duplicate_hashes":$dupHashes,""" +
        s""""hash_set_diff":$hashSetDiff,"pass":$dedupPass},""" +
        s""""s_rollup_maintain":{"pre_kill_batches":$rollupPreKill,"killed_mid_stream":$rollupMid,""" +
        s""""dup_in_batch":$dupInBatch,"final_mv_diff":$mvDiff,"pass":$rollupPass}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("stream_recovery_soak.json"),
      (json + "\n").getBytes("UTF-8"))
    // fold into stream_soak.json (the streaming soak's single artifact):
    // replace any previous recovery section, keep the rate phase verbatim
    val soakPath = java.nio.file.Paths.get("stream_soak.json")
    if (java.nio.file.Files.exists(soakPath)) {
      val base0 = new String(java.nio.file.Files.readAllBytes(soakPath), "UTF-8").trim
      val cut = base0.indexOf(",\"recovery\":")
      val base = (if (cut >= 0) base0.substring(0, cut) + "}" else base0).stripSuffix("}")
      java.nio.file.Files.write(soakPath, (base + s""","recovery":$json}""" + "\n").getBytes("UTF-8"))
    }
    println(s"[recovery] pass=${dedupPass && rollupPass} -> stream_recovery_soak.json")
    spark.stop()
    if (!(dedupPass && rollupPass)) sys.exit(1)
  }
}
