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
