package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.RollupStream

/** The maintained rollup must (a) equal the batch rollup on the same
  * data and (b) INCREMENT counts across micro-batches — the ingest-time
  * twin of the reference's monthly MV refresh.
  */
class RollupStreamSpec extends SparkSpec {

  private def ev(id: Long, user: Long, ch: String, dayOffset: Int) =
    Ev(id, user, ch, new Timestamp(1704067200000L + dayOffset * 86400000L), 1d)

  test("streaming rollup equals the batch rollup and increments across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // batch 1: user 1 chats 3 times in ch0's first week; batch 2 adds 2
    // more in the SAME (user, channel, week) plus a new user
    val b1 = Seq(ev(1, 1, "ch0", 0), ev(2, 1, "ch0", 1), ev(3, 1, "ch0", 2))
    val b2 = Seq(ev(4, 1, "ch0", 3), ev(5, 1, "ch0", 3), ev(6, 2, "ch1", 3))

    val stream = MemoryStream[Ev]
    val query = RollupStream.maintained(stream.toDF())
      .writeStream.format("memory").queryName("rollup_mv")
      .outputMode("complete").start()
    stream.addData(b1)
    query.processAllAvailable()
    val afterB1 = s.table("rollup_mv").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    stream.addData(b2)
    query.processAllAvailable()
    val afterB2 = s.table("rollup_mv").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    query.stop()

    // cross-batch increment: 3 -> 5 for the same key, new key appears
    assert(afterB1((1L, "ch0")) == 3L)
    assert(afterB2((1L, "ch0")) == 5L)
    assert(afterB2((2L, "ch1")) == 1L)

    // final maintained state == the batch rollup over the union,
    // INCLUDING the week column (the streaming window key must produce
    // the same Monday-truncated weeks as date_trunc)
    val batch = RollupStream.maintained((b1 ++ b2).toDF())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString) -> r.getLong(3)).toMap
    val afterB2Full = s.table("rollup_mv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString) -> r.getLong(3)).toMap
    assert(afterB2Full == batch)
  }

  test("watermarked rollup drops rows behind the watermark (closed weeks are final)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val stream = MemoryStream[Ev]
    val query = RollupStream.maintained(stream.toDF(), watermark = Some("14 days"))
      .writeStream.format("memory").queryName("rollup_wm")
      .outputMode("update").start()
    // batch 1 seeds week 0; batch 2 jumps 40 days ahead, advancing the
    // watermark to day 26 — week 0 closes
    stream.addData(Seq(ev(1, 1, "ch0", 0), ev(2, 1, "ch0", 1)))
    query.processAllAvailable()
    stream.addData(Seq(ev(3, 1, "ch0", 40)))
    query.processAllAvailable()
    // batch 3: a LATE row for the closed week must be dropped, not
    // re-open the aggregate; a live-week row still lands
    stream.addData(Seq(ev(4, 1, "ch0", 0), ev(5, 1, "ch0", 41)))
    query.processAllAvailable()
    query.stop()
    val updates = s.table("rollup_wm").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString, r.getLong(3)))
    // week-0 count never advanced past batch 1's value of 2
    val week0 = updates.filter(_._3 == "2024-01-01")
    assert(week0.nonEmpty && week0.map(_._4).max == 2L,
      s"late row re-opened a closed week: ${week0.mkString(",")}")
    // the live week accumulated both post-jump rows
    val live = updates.filter(u => u._3 != "2024-01-01")
    assert(live.map(_._4).max == 2L, s"live week missed updates: ${live.mkString(",")}")
  }
}
