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

  /** get_video_highlights (api.py:2918): per-video highlight listing for a
    * channel group and month — highlights (lineitem) joined to videos
    * (orders) and the channel dim, with the relative-offset computation
    * (reference: start_seconds - (end_time - duration)).
    *
    * Scale: the month predicate prunes the orders scan (partition pruning
    * on a date-partitioned layout), the channel dim is broadcast, and the
    * highlight-video join is keyed by video id — the natural co-partition
    * (bucket both by video id to make it shuffle-free).
    */
  def videoHighlights(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                      group: String = "AUTOMOBILE", month: String = "1996-03-01"): DataFrame =
    lineitem
      .join(orders.filter(to_date(date_trunc("month", col("o_orderdate"))) === to_date(lit(month))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === group)
          .select(col("c_custkey"), col("c_name").as("channel"))),
        col("o_custkey") === col("c_custkey"))
      .select(
        col("l_orderkey").as("video_id"),
        col("channel"),
        col("o_orderpriority").as("title"),
        col("l_returnflag").as("topic_tag"),
        col("l_linenumber").as("highlight_idx"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("int").as("relative_days"))

  def videoHighlightsSql(group: String = "AUTOMOBILE", month: String = "1996-03-01"): String =
    s"""SELECT l.l_orderkey AS video_id, c.c_name AS channel,
       | o.o_orderpriority AS title, l.l_returnflag AS topic_tag,
       | l.l_linenumber AS highlight_idx,
       | CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INT) AS relative_days
       | FROM lineitem l
       | JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  AND CAST(date_trunc('month', o.o_orderdate) AS DATE) = DATE '$month'
       | JOIN customer c ON o.o_custkey = c.c_custkey
       |  AND c.c_mktsegment = '$group'""".stripMargin.replace("\n", "")

  /** get_funniest_timestamps (api.py:2680): per-video funniest-moment
    * offsets for one channel group and month. The reference query computes a
    * `last_chat` relation (MAX(last_message_at) per video inside the month),
    * joins it back to the videos of the channel, and projects
    * `EXTRACT(EPOCH FROM funniest - last_message_at + duration)` — the
    * player-relative seek offset. Testdata mapping: videos = `orders`
    * (duration seconds = floor(o_totalprice), end_time = o_orderdate),
    * per-video chat = `lineitem` (l_shipdate as message time), funniest
    * analog = mid-stream (end - duration + duration/2).
    *
    * Scale: the month predicate prunes the lineitem scan; the channel dim is
    * broadcast; last_chat is a partial-agg rollup keyed by video id joining
    * orders on its natural key (bucket both by order key → shuffle-free).
    */
  def funniestOffsets(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                      group: String = "AUTOMOBILE", month: String = "1996-03-01"): DataFrame = {
    val monthStart = to_date(lit(month))
    val chans = broadcast(customer.filter(col("c_mktsegment") === group)
      .select(col("c_custkey"), col("c_name").as("channel")))
    val vids = orders.join(chans, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("channel"), col("o_orderpriority").as("title"),
        floor(col("o_orderdate").cast("timestamp").cast("double")).cast("long").as("end_epoch"),
        floor(col("o_totalprice")).cast("long").as("dur"))
    // last_chat aggregates the MONTH's chat per video with no group
    // prune — exactly the oracle CTE's shape. The month predicate prunes
    // the fact at the scan; MAX is a partial (map-side) aggregate, so the
    // only shuffle carries per-video partials (∝ distinct videos chatting
    // in the month, agg-compressed), never pre-agg fact rows — the same
    // bytes a group-scoped rollup would shuffle into its own final agg.
    // Other groups' videos drop out of the final inner join on vids, so
    // rows are unchanged. An earlier round pruned the fact with a FORCED
    // broadcast semi-join on the group's video keys; vids is the group's
    // ALL-TIME order keys — a fact-proportional relation — so the
    // unconditional hint was a driver-OOM/broadcast-limit hazard at scale
    // (ADVICE r11), and with partial aggregation it bought nothing the
    // agg does not already do.
    val lastChat = lineitem
      .filter(col("l_shipdate") >= monthStart && col("l_shipdate") < add_months(monthStart, 1))
      .groupBy(col("l_orderkey"))
      .agg(floor(max(col("l_shipdate")).cast("timestamp").cast("double")).cast("long").as("last_chat_epoch"))
    vids
      .join(lastChat, col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_orderkey").as("video_id"), col("channel"), col("title"),
        // funniest = end - dur + dur/2; relative = funniest - last_chat + dur
        (col("end_epoch") - col("dur") + expr("dur div 2")
          - col("last_chat_epoch") + col("dur")).as("relative_ts"))
  }

  def funniestOffsetsSql(group: String = "AUTOMOBILE", month: String = "1996-03-01"): String =
    s"""WITH chans AS (
       |  SELECT c_custkey, c_name AS channel FROM customer WHERE c_mktsegment = '$group'),
       | vids AS (
       |  SELECT o_orderkey, channel, o_orderpriority AS title,
       |   CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS end_epoch,
       |   CAST(floor(o_totalprice) AS BIGINT) AS dur
       |  FROM orders JOIN chans ON o_custkey = c_custkey),
       | last_chat AS (
       |  SELECT l_orderkey, CAST(floor(epoch(CAST(MAX(l_shipdate) AS TIMESTAMP))) AS BIGINT) AS last_chat_epoch
       |  FROM lineitem
       |  WHERE l_shipdate >= DATE '$month' AND l_shipdate < DATE '$month' + INTERVAL 1 MONTH
       |  GROUP BY 1)
       | SELECT v.o_orderkey AS video_id, v.channel, v.title,
       |  v.end_epoch - v.dur + v.dur // 2 - lc.last_chat_epoch + v.dur AS relative_ts
       | FROM vids v JOIN last_chat lc ON v.o_orderkey = lc.l_orderkey""".stripMargin.replace("\n", "")

  /** Chat-log coverage QA (data_ingestion/check_log_length.py): how much of
    * each channel-day the chat log actually spans, as the fraction of
    * distinct 15-minute buckets with at least one message. One partial-agg
    * shuffle; integer bucket math is engine-exact.
    */
  def logCoverage(events: DataFrame, bucketS: Long = 900L): DataFrame = {
    val bucketsPerDay = 86400L / bucketS
    events.filter(!isGift)
      .groupBy(channel, EventSemantics.day.as("day"))
      .agg(
        countDistinct(floor(epochS / bucketS)).as("buckets"),
        count(lit(1)).as("n_messages"))
      .withColumn("coverage_pct",
        fl(col("buckets").cast("double") * 100d / lit(bucketsPerDay).cast("double"), 4))
  }

  def logCoverageSql(bucketS: Long = 900L): String =
    s"""SELECT $channelSql AS channel, $daySql AS day,
       | COUNT(DISTINCT CAST(floor($epochSSql / $bucketS) AS BIGINT)) AS buckets,
       | COUNT(*) AS n_messages,
       | ${flSql(s"CAST(COUNT(DISTINCT CAST(floor($epochSSql / $bucketS) AS BIGINT)) AS DOUBLE) * 100 / ${86400L / bucketS}", 4)} AS coverage_pct
       | FROM events WHERE NOT $isGiftSql GROUP BY 1, 2""".stripMargin.replace("\n", "")
}
