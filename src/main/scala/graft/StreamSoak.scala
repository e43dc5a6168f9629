package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Real rate-limited readStream soak for the streaming twins (SURVEY §10
  * item 2 / VERDICT r06 item 3): the bounded-state claims of
  * `s_stream_dedup` / `s_sketch_maintain` / `s_rollup_maintain` are proven
  * by spec on micro-batch twins; this main runs each as an actual
  * continuous query against the `rate` source for minutes and records the
  * state store's row count and bytes per micro-batch — the artifact that
  * shows state going FLAT once the watermark horizon starts evicting,
  * instead of growing with everything ever ingested.
  *
  * Event time is synthetic and advances ~1 day per wall-second (ts = base
  * + value/rate days), so a 7-day window closes every ~7 s and the 14-day
  * watermark horizon spans ~14 s of wall time — a 2-minute run crosses
  * ~17 weeks, plenty of open-evict cycles. Input cardinalities are sized
  * so unbounded state would be OBVIOUS: the dedup stream sees a fresh
  * content hash every 3 rows (state would grow by rate/3 rows per second
  * forever without eviction), the rollup sees U×C live (user, channel)
  * groups per week, the sketch C channels per week.
  *
  * Writes `stream_soak.json`: per-query series of
  * (batch, input_rows, state_rows, state_bytes, watermark) plus peak/final
  * state and a grew-after-horizon verdict. Referenced from SCALING.md.
  */
object StreamSoak {

  private final case class Point(batch: Long, inputRows: Long,
                                 stateRows: Long, stateBytes: Long,
                                 watermark: String)

  def main(args: Array[String]): Unit = {
    val secondsPerQuery = if (args.nonEmpty) args(0).toInt else 120
    val rate = 2000 // rows per second
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "8") // state files per operator = partitions
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one synthetic event-time clock for all three: value counts rows, so
    // base + value/rate wall-seconds x 86400 = ~1 event-day per wall-second
    def timed(df: DataFrame): DataFrame =
      df.withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("value") * lit(86400.0 / rate)))

    def rateSrc: DataFrame =
      spark.readStream.format("rate").option("rowsPerSecond", rate.toString).load()

    // s_stream_dedup: fresh hash every 3 rows; copies arrive adjacent, so
    // within-watermark dedup drops them and eviction bounds the hash state
    def dedupStream: DataFrame =
      streaming.DedupStream.dedupStream(
        timed(rateSrc).withColumn("text", concat(lit("doc "), (col("value") / 3).cast("long"))),
        watermark = "1 day")

    // s_rollup_maintain: 499 users x 4 channels of live groups per week
    // (odd modulus so user and channel decorrelate into the full product)
    def rollupStream: DataFrame =
      streaming.RollupStream.maintained(
        timed(rateSrc)
          .withColumn("event_id", col("value"))
          .withColumn("user_id", col("value") % 499)
          .withColumn("event_type", concat(lit("ch"), col("value") % 4)))

    // s_sketch_maintain: one HLL buffer per (channel, week)
    def sketchStream: DataFrame =
      streaming.SketchStream.maintained(
        timed(rateSrc)
          .withColumn("event_id", col("value"))
          .withColumn("user_id", col("value") % 5000)
          .withColumn("event_type", concat(lit("ch"), col("value") % 4)))

    val runs = Seq(
      ("s_stream_dedup", () => dedupStream, "append"),
      ("s_rollup_maintain", () => rollupStream, "update"),
      ("s_sketch_maintain", () => sketchStream, "update"))

    val results = runs.map { case (name, build, mode) =>
      val points = ArrayBuffer.empty[Point]
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val st = p.stateOperators
          if (st.nonEmpty) points.synchronized {
            points += Point(p.batchId, p.numInputRows,
              st.map(_.numRowsTotal).sum, st.map(_.memoryUsedBytes).sum,
              Option(p.eventTime.get("watermark")).getOrElse(""))
          }
        }
      }
      spark.streams.addListener(listener)
      val ckpt = s"target/stream_soak/ckpt_$name"
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(ckpt), true)
      val q = build().writeStream
        .format("noop").outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("1 second"))
        .start()
      q.awaitTermination(secondsPerQuery * 1000L)
      q.stop()
      spark.streams.removeListener(listener)
      val series = points.synchronized(points.toVector)
      // verdict: after the horizon (first watermark movement + 20 batches
      // of settling), state must stop growing — compare the last-third max
      // against the middle-third max
      val n = series.length
      val mid = series.slice(n / 3, 2 * n / 3).map(_.stateRows)
      val last = series.slice(2 * n / 3, n).map(_.stateRows)
      val flat = mid.nonEmpty && last.nonEmpty &&
        last.max <= math.max((mid.max * 1.3).toLong, mid.max + 100)
      println(s"[soak] $name: ${n} batches, peak state ${if (n > 0) series.map(_.stateRows).max else 0} rows, " +
        s"final ${series.lastOption.map(_.stateRows).getOrElse(0L)}, flat_after_horizon=$flat")
      (name, series, flat)
    }

    val json = results.map { case (name, series, flat) =>
      val pts = series.map(p =>
        s"""{"batch":${p.batch},"input_rows":${p.inputRows},"state_rows":${p.stateRows},""" +
        s""""state_bytes":${p.stateBytes},"watermark":"${p.watermark}"}""").mkString("[", ",", "]")
      s""""$name":{"flat_after_horizon":$flat,""" +
        s""""peak_state_rows":${if (series.nonEmpty) series.map(_.stateRows).max else 0},""" +
        s""""final_state_rows":${series.lastOption.map(_.stateRows).getOrElse(0L)},""" +
        s""""batches":${series.length},"series":$pts}"""
    }.mkString("{", ",", s""","rate_rows_per_s":$rate,"seconds_per_query":$secondsPerQuery}""")
    java.nio.file.Files.write(java.nio.file.Paths.get("stream_soak.json"),
      (json + "\n").getBytes("UTF-8"))
    val allFlat = results.forall(_._3)
    println(s"[soak] all flat after horizon: $allFlat -> stream_soak.json")
    spark.stop()
    if (!allFlat) sys.exit(1)
  }
}
