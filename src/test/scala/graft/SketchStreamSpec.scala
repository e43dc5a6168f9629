package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SketchStream

/** Streaming sketch maintenance ≡ batch sketch rollup, and the sketch
  * state keeps folding users in across micro-batch boundaries.
  */
class SketchStreamSpec extends SparkSpec {

  private def ev(id: Long, user: Long, ch: String, dayOffset: Int) =
    Ev(id, user, ch, new Timestamp(1704067200000L + dayOffset * 86400000L), 1d)

  test("streamed sketch estimates equal the batch rollup and increment across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // batch 1: 3 users in ch0's first week; batch 2 adds 2 NEW users to
    // the same (channel, week) plus a second channel
    val b1 = Seq(ev(1, 1, "ch0", 0), ev(2, 2, "ch0", 1), ev(3, 3, "ch0", 2))
    val b2 = Seq(ev(4, 4, "ch0", 3), ev(5, 5, "ch0", 3), ev(6, 1, "ch1", 3))

    val stream = MemoryStream[Ev]
    val query = SketchStream.maintained(stream.toDF())
      .writeStream.format("memory").queryName("sketch_mv")
      .outputMode("complete").start()
    stream.addData(b1)
    query.processAllAvailable()
    val afterB1 = s.table("sketch_mv").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    stream.addData(b2)
    query.processAllAvailable()
    val afterB2 = s.table("sketch_mv").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    query.stop()

    // tiny exact cardinalities: HLL is exact at this size
    assert(afterB1(("ch0", "2024-01-01")) == 3L)
    assert(afterB2(("ch0", "2024-01-01")) == 5L, "sketch state must fold new users in")
    assert(afterB2(("ch1", "2024-01-01")) == 1L)

    // final streamed state == the batch twin over the union
    val batch = SketchStream.maintained((b1 ++ b2).toDF())
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    assert(afterB2 == batch)
  }
}
