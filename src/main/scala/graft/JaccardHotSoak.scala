package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Hot-shingle soak for the capped n-gram Jaccard (VERDICT r06 item 5):
  * the bench corpus word-tags replica text, so no shingle is genuinely
  * corpus-hot and the capped path's rarity decomposition is pure overhead
  * there (2.16 s vs the exhaustive 1.59 s at sf0.1). This main builds the
  * corpus the cap EXISTS for — every document shares a planted stopword
  * prefix, so a handful of shingle values carry df ≈ corpus size and the
  * exhaustive inverted-index join goes quadratic on them — then measures
  * both paths' wall AND executor CPU (JobCounter) plus the candidate-pair
  * counts, and verifies output identity at [[Dedup.autoJaccardCap]]'s
  * zero-loss cap. Writes `jaccard_hot_soak.json`.
  */
object JaccardHotSoak {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // cappedOnly: at x10 the exhaustive hot join (~6.6G candidate pairs)
    // kills executors outright — this mode documents that the capped path
    // alone still completes there
    val cappedOnly = args.length > 1 && args(1) == "cappedOnly"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 50 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the gate corpus, with true stopword shingles planted on every LONG
    // document (the 8-word prefix contributes 6 trigrams at df ≈ corpus
    // size). Long docs only, by design: on a SHORT doc the prefix is a
    // majority of its shingles, so two short docs form a GENUINE J≥0.3
    // pair whose shared shingles are all hot — a corpus where capping is
    // provably lossy and autoJaccardCap correctly refuses to prune
    // (measured: planting on all 619 sf0.01 docs drives the zero-loss cap
    // to 619). With the prefix on long docs the hot shingles are pure
    // candidate-generation noise — the stopword regime the cap exists for.
    val hot = "in the of and to for on at"
    val docs = Fixtures.plantedDocs(Tables.documents(spark, sfDir))
      .withColumn("text",
        when(size(split(col("text"), "\\s+")) >= 30, concat(lit(hot + " "), col("text")))
          .otherwise(col("text")))
      .cache()
    val nDocs = docs.count()
    val nPlanted = docs.filter(col("text").startsWith(hot)).count()

    val counter = new JobCounter(spark.sparkContext)
    def measure(df: => DataFrame): (Long, Double, JobCounter.Snapshot, Long) = {
      Caches.release()
      spark.catalog.clearCache() // drops docs' registration too —
      docs.cache()               // re-REGISTER, then re-pin
      docs.count()
      val before = counter.snapshot()
      val t0 = System.nanoTime()
      val d = df
      val rows = d.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // snapshot BEFORE the verification hash: its re-execution of the
      // pipeline must be excluded from cpu/run exactly as it is from wall
      val snap = counter.snapshot() - before
      val h = Option(d.agg(sum(hash(col("doc_a"), col("doc_b"), col("jaccard"))).cast("long"))
        .head().getAs[java.lang.Long](0)).map(_.toLong).getOrElse(0L)
      (rows, wall, snap, h)
    }

    val cap = Dedup.autoJaccardCap(docs)
    // candidate-pair volume each path's inverted-index join generates —
    // the quadratic the cap removes (sum over shingles of C(df, 2))
    val (dfTop, candEx, candCap) = Dedup.shingleDfStats(docs, cap = cap)

    val (rowsCap, wallCap, mCap, hashCap) =
      measure(Dedup.ngramJaccard(docs, minJaccard = 0.3, maxDf = Some(cap)))
    val exJson = if (cappedOnly) """"exhaustive":"SKIPPED (kills executors at this scale)"""" else {
      val (rowsEx, wallEx, mEx, hashEx) = measure(Dedup.ngramJaccard(docs, minJaccard = 0.3))
      require(rowsEx == rowsCap && hashEx == hashCap,
        s"capped output diverged: $rowsEx/$hashEx vs $rowsCap/$hashCap at cap=$cap")
      s""""output_identical":true,"exhaustive":{"wall_s":${Actions.fmt(wallEx, 2)},""" +
        s""""cpu_s":${mEx.cpuMs / 1000d},"run_s":${mEx.runMs / 1000d}}"""
    }
    val line = s"""{"sf":"$sfDir","docs":$nDocs,"planted_hot_docs":$nPlanted,""" +
      s""""hot_df_top":$dfTop,"auto_cap":$cap,""" +
      s""""cand_pairs_exhaustive":$candEx,"cand_pairs_capped":$candCap,""" +
      s""""pairs_out":$rowsCap,$exJson,""" +
      s""""capped":{"wall_s":${Actions.fmt(wallCap, 2)},"cpu_s":${mCap.cpuMs / 1000d},"run_s":${mCap.runMs / 1000d}}}"""
    println(line)
    val out = java.nio.file.Paths.get("jaccard_hot_soak.json")
    val prev = if (java.nio.file.Files.exists(out))
      new String(java.nio.file.Files.readAllBytes(out), "UTF-8") else ""
    java.nio.file.Files.write(out, (prev + line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
