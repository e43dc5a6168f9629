package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.VelocityStream

/** Streaming ≡ batch for burst detection, and append-mode emits a burst
  * exactly once (when its window finalizes) across micro-batch boundaries.
  */
class VelocityStreamSpec extends SparkSpec {

  private val t0 = 1704067200000L // 2024-01-01 00:00 UTC, a window boundary

  private def ev(id: Long, ch: String, minutes: Long): EvV =
    EvV(id, id % 7, ch, new Timestamp(t0 + minutes * 60000L), 0d)

  test("streaming bursts match the batch twin on the same rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // ch0 bursts in window 0 (8 msgs, one a gift → 7 counted), ch1 stays
    // under threshold (3 msgs), ch0 bursts again in window 2
    val rows =
      (0L until 8L).map(i => ev(i, "ch0", i)) ++
      (10L until 13L).map(i => ev(i, "ch1", i - 10)) ++
      (20L until 27L).map(i => ev(i, "ch0", 30 + (i - 20)))

    val stream = MemoryStream[EvV]
    stream.addData(rows)
    val q = VelocityStream.bursts(stream.toDF(), watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("bursts_all")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = s.table("bursts_all").collect().map(_.toSeq).toSet
    q.stop()

    val batch = VelocityStream.bursts(rows.toDF()).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.map(_(1)) == Set("ch0"), "only ch0 crosses the burst threshold")
    assert(batch.size == 2, "two distinct burst windows")
  }

  test("append mode: a burst is emitted once, when the watermark finalizes its window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val stream = MemoryStream[EvV]
    val q = VelocityStream.bursts(stream.toDF(), watermark = Some("15 minutes"))
      .writeStream.format("memory").queryName("bursts_append")
      .outputMode("append").start()

    // batch 1: 4 msgs in window 0 — under threshold so far, nothing emitted
    // (ids start at 1: event_id 0 would be a gift, which doesn't count)
    stream.addData((1L until 5L).map(i => ev(i, "ch0", i)))
    q.processAllAvailable()
    assert(s.table("bursts_append").count() == 0)

    // batch 2: 3 more msgs in window 0 ACROSS the micro-batch boundary
    // (state must accumulate 4+3=7 > 5), plus a row far ahead that pushes
    // the watermark past window 0's end so it finalizes
    stream.addData((5L until 8L).map(i => ev(i, "ch0", 5 + (i - 5))) :+ ev(99, "ch0", 60))
    q.processAllAvailable()
    val out = s.table("bursts_append").collect()
    q.stop()

    assert(out.length == 1, "exactly one finalized burst row")
    assert(out(0).getTimestamp(0) == new Timestamp(t0))
    assert(out(0).getLong(2) == 7L, "count must accumulate across micro-batches")
  }
}

case class EvV(event_id: Long, user_id: Long, event_type: String, ts: Timestamp, value: Double)
