package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

case class Ev(event_id: Long, user_id: Long, event_type: String, ts: Timestamp, value: Double)

/** Streaming ≡ batch: the same sessionize transform over a MemoryStream
  * must produce exactly the rows the batch plan produces on the same data.
  */
class EventStreamSpec extends SparkSpec {

  private def mkEvents: Seq[Ev] =
    (0 until 200).map { i =>
      Ev(i.toLong, (i % 17).toLong, s"ch${i % 3}",
        new Timestamp(1704067200000L + i * 137000L), (i % 100).toDouble)
    }

  test("streaming windowed aggregation matches the batch twin") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val data = mkEvents
    val stream = MemoryStream[Ev]
    stream.addData(data)

    val query = EventStream.sessionize(stream.toDF(), watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("sessionized")
      .outputMode("complete").start()
    query.processAllAvailable()

    val streamed = s.table("sessionized")
      .select("window_start", "channel", "n_events")
      .collect().map(_.toSeq).toSet
    query.stop()

    val batch = EventStream.sessionize(data.toDF(), watermark = None)
      .select("window_start", "channel", "n_events")
      .collect().map(_.toSeq).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("watermark drops late data: a row older than the watermark never lands") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val t0 = 1704067200000L
    def at(minutes: Long, id: Long) =
      Ev(id, id % 5, "ch0", new Timestamp(t0 + minutes * 60000L), 0d)

    val stream = MemoryStream[Ev]
    val query = EventStream.sessionize(stream.toDF(), windowLen = "10 minutes",
      watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("late_data")
      .outputMode("append").start()

    // batch 1: 3 rows in the first window, then one far ahead — after this
    // batch the watermark (max event time - 10 min) is past the first
    // window's end, so it finalizes and is emitted
    stream.addData(Seq(at(0, 1), at(1, 2), at(2, 3), at(40, 4)))
    query.processAllAvailable()
    // batch 2: a LATE row for the first window (event time below the
    // watermark) must be discarded, not re-open the finalized window
    stream.addData(Seq(at(3, 5), at(41, 6)))
    query.processAllAvailable()
    val firstWindow = s.table("late_data")
      .filter(col("window_start") === new Timestamp(t0))
      .select("n_events").collect()
    query.stop()

    assert(firstWindow.length == 1, "finalized window must be emitted exactly once")
    assert(firstWindow(0).getLong(0) == 3L,
      "late row leaked into the finalized window")
  }

  test("exact batch twin agrees with streaming twin on counts") {
    val s = spark
    import s.implicits._
    val df = mkEvents.toDF()
    val exact = EventStream.sessionizeExact(df)
      .select("window_start", "channel", "n_events").collect().map(_.toSeq).toSet
    val win = EventStream.sessionize(df)
      .select("window_start", "channel", "n_events").collect().map(_.toSeq).toSet
    assert(exact == win)
  }
}
