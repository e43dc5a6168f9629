package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import EventSemantics._

/** Highlight detection — the reference's funniest-moment bucketing
  * (utils/feature_analysis.py:30 get_feature_timestamps) and the AI-summary
  * chat-velocity candidate moments (utils/ai_summarizer.py:138-154).
  *
  * Both are per-stream ("channel-day") bucket-argmax plans: bucket the
  * event time, count per bucket, rank inside the partition. The ranking
  * window is per channel-day, so partitions stay small and independent at
  * any scale; ties break on earliest bucket for determinism.
  */
object Highlights {

  private val epochS = floor(col("ts").cast("double")).cast("long")
  private val epochSSql = "CAST(floor(epoch(ts)) AS BIGINT)"

  /** Funniest moment per channel-day: 30-minute humor-concentration
    * buckets, argmax, shifted back 10 s (reference uses 30 s buckets on
    * seconds-dense chat; the bucket width scales with event density).
    */
  def funniestMoment(events: DataFrame, bucketS: Long = 1800L): DataFrame = {
    val counts = events
      .filter(isHumor && !isGift)
      .groupBy(channel, EventSemantics.day.as("day"), floor(epochS / bucketS).cast("long").as("bucket"))
      .agg(count(lit(1)).as("humor_n"))
    val w = Window.partitionBy("channel", "day")
      .orderBy(col("humor_n").desc, col("bucket").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("funniest_ts", col("bucket") * bucketS - 10L)
      .select("channel", "day", "funniest_ts", "humor_n")
  }

  def funniestMomentSql(bucketS: Long = 1800L): String =
    s"""WITH counts AS (
       | SELECT $channelSql AS channel, $daySql AS day,
       |  CAST(floor($epochSSql / $bucketS) AS BIGINT) AS bucket, COUNT(*) AS humor_n
       | FROM events WHERE $isHumorSql AND NOT $isGiftSql GROUP BY 1, 2, 3)
       | SELECT channel, day, bucket * $bucketS - 10 AS funniest_ts, humor_n FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY channel, day
       |    ORDER BY humor_n DESC, bucket ASC) AS rn FROM counts)
       | WHERE rn = 1""".stripMargin.replace("\n", "")

  /** Chat-velocity highlight candidates per channel-day: 15-minute message
    * buckets, top-N above a minimum burst size (ai_summarizer.py:139-143:
    * nlargest(num_highlights) with count > 9).
    */
  def highlightVelocity(events: DataFrame, bucketS: Long = 900L, topN: Int = 3, minBurst: Long = 5L): DataFrame = {
    val counts = events
      .filter(!isGift)
      .groupBy(channel, EventSemantics.day.as("day"), floor(epochS / bucketS).cast("long").as("bucket"))
      .agg(count(lit(1)).as("velocity"))
    val w = Window.partitionBy("channel", "day")
      .orderBy(col("velocity").desc, col("bucket").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN && col("velocity") > minBurst)
      .withColumn("spike_start", col("bucket") * bucketS)
      .select("channel", "day", "spike_start", "velocity")
  }

  def highlightVelocitySql(bucketS: Long = 900L, topN: Int = 3, minBurst: Long = 5L): String =
    s"""WITH counts AS (
       | SELECT $channelSql AS channel, $daySql AS day,
       |  CAST(floor($epochSSql / $bucketS) AS BIGINT) AS bucket, COUNT(*) AS velocity
       | FROM events WHERE NOT $isGiftSql GROUP BY 1, 2, 3)
       | SELECT channel, day, bucket * $bucketS AS spike_start, velocity FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY channel, day
       |    ORDER BY velocity DESC, bucket ASC) AS rn FROM counts)
       | WHERE rn <= $topN AND velocity > $minBurst""".stripMargin.replace("\n", "")
}
