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

  test("gap sessions: streaming session_window matches the batch twin, merging across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val t0 = 1704067200000L
    def at(minutes: Long, id: Long, user: Long) =
      Ev(id, user, "ch0", new Timestamp(t0 + minutes * 60000L), 0d)

    // user 1: events at 0, 10, 20 min (one session), then 120 min (new
    // session); user 2: single event
    val batch1 = Seq(at(0, 1, 1), at(10, 2, 1), at(20, 3, 1), at(5, 4, 2))
    val batch2 = Seq(at(29, 5, 1), at(120, 6, 1), at(600, 99, 1)) // 29min MERGES into the open session

    val stream = MemoryStream[Ev]
    val q = graft.streaming.EventStream.gapSessions(stream.toDF(), gap = "30 minutes",
      watermark = Some("1 minute"))
      .writeStream.format("memory").queryName("gap_sessions")
      .outputMode("append").start()
    stream.addData(batch1)
    q.processAllAvailable()
    stream.addData(batch2)
    q.processAllAvailable()
    val streamed = s.table("gap_sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    q.stop()

    val batch = graft.streaming.EventStream.gapSessions((batch1 ++ batch2).toDF())
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // every session the stream finalized must match the batch computation
    assert(streamed.subsetOf(batch), s"streamed $streamed not in batch $batch")
    // the cross-batch merge: user 1's first session must count 4 events
    // (0,10,20 from batch 1 + 29 from batch 2)
    assert(streamed.contains((1L, new Timestamp(t0), 4L)),
      s"open session did not absorb the next batch's in-gap event: $streamed")
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
