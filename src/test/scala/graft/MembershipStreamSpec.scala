package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.MembershipStream

/** Stateful streaming ≡ batch: membership transitions detected through
  * flatMapGroupsWithState over a two-batch MemoryStream feed must equal the
  * single-pass batch run — i.e. per-group state must carry the last rank
  * across micro-batch boundaries.
  */
class MembershipStreamSpec extends SparkSpec {

  // ranks drift by day (EventSemantics.membershipRank), so a multi-day
  // event sequence produces transitions for every user
  private def mkEvents: Seq[Ev] =
    (0 until 300).map { i =>
      Ev(i.toLong, (i % 11).toLong, s"ch${i % 2}",
        new Timestamp(1704067200000L + i * 3600000L), (i % 100).toDouble)
    }

  test("stateful transitions carry state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val data = mkEvents
    // split mid-way so several (user, channel) groups span both batches
    val (first, second) = data.splitAt(150)

    val stream = MemoryStream[Ev]
    val query = MembershipStream.transitions(stream.toDF())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    stream.addData(first)
    query.processAllAvailable()
    stream.addData(second)
    query.processAllAvailable()

    val streamed = s.table("transitions").collect().map(_.toSeq).toSet
    query.stop()

    val batch = MembershipStream.transitions(data.toDF()).collect()
      .map(t => Seq[Any](t.user_id, t.channel, t.ts, t.prev_rank, t.new_rank, t.kind)).toSet

    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("transition kinds are consistent with rank movement") {
    val s = spark
    import s.implicits._
    val out = MembershipStream.transitions(mkEvents.toDF()).collect()
    assert(out.nonEmpty)
    out.foreach { t =>
      assert(t.prev_rank != t.new_rank)
      t.kind match {
        case "gained" => assert(t.prev_rank == -1 && t.new_rank >= 0)
        case "lost" => assert(t.prev_rank >= 0 && t.new_rank == -1)
        case "changed" => assert(t.prev_rank >= 0 && t.new_rank >= 0)
        case other => fail(s"unknown kind $other")
      }
    }
  }
}
