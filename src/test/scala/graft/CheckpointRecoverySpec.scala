package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{ClusterStream, DedupStream, EventStream, MembershipStream,
  RollupStream, SketchStream, VelocityStream}

/** Checkpoint RECOVERY, not just cross-batch state: each test stops a
  * streaming query, adds more data, and restarts a NEW query from the same
  * checkpointLocation. The restarted run must
  *   (a) not re-emit run-1's output (offsets recovered — no duplication),
  *   (b) still see run-1's state (state store recovered — no loss),
  * and the union of both runs' outputs must equal the batch twin over all
  * the data — the exactly-once-across-restart property a 100 TB/day ingest
  * relies on after an executor/driver crash. Micro-batch specs
  * (DedupStreamSpec etc.) prove state crosses BATCH boundaries; these prove
  * it crosses PROCESS-LIFETIME boundaries.
  */
class CheckpointRecoverySpec extends SparkSpec {

  private val t0 = 1704067200000L
  private def ts(offsetS: Long) = new Timestamp(t0 + offsetS * 1000L)
  private def ev(id: Long, user: Long, ch: String, dayOffset: Int) =
    Ev(id, user, ch, new Timestamp(t0 + dayOffset * 86400000L), 1d)
  private def ckptDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ckpt-$tag").toString

  /** Run `df` as a streaming query into a driver-side buffer via
    * foreachBatch (the memory sink does not support checkpoint recovery),
    * draining everything available, then stop. Returns the collected rows.
    * foreachBatch replays an uncommitted batch after a crash; after a
    * clean processAllAvailable+stop the commit log is complete, so a
    * restart resumes exactly after run-1's data.
    */
  private def drainRun(df: org.apache.spark.sql.DataFrame, ckpt: String,
                       mode: String): Seq[org.apache.spark.sql.Row] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = df.writeStream
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.collect()
        buf.synchronized { buf ++= rows }
        () // the (Dataset, Long) => Unit overload
      }
      .start()
    q.processAllAvailable()
    q.stop()
    buf.synchronized { buf.toSeq }
  }

  private def evm(id: Long, user: Long, ch: String, minutes: Long) =
    Ev(id, user, ch, new Timestamp(t0 + minutes * 60000L), 1d)

  test("s_stream_membership: restarted flatMapGroupsWithState remembers the last rank") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // user 1 in ch0: rank = (1 + dayofmonth) % 8 - 1 walks 1 → 2 → 3 over
    // days 1..3 in run 1, then → 4 on day 4 in run 2 — that last
    // transition's prev_rank can ONLY come from recovered GroupState
    val b1 = Seq(ev(1, 1, "ch0", 0), ev(2, 1, "ch0", 1), ev(3, 1, "ch0", 2),
      ev(4, 3, "ch9", 0)) // single sighting: no transition ever
    val b2 = Seq(ev(5, 1, "ch0", 3), ev(6, 2, "ch1", 3)) // user 2: first sighting

    val ckpt = ckptDir("membership")
    val stream = MemoryStream[Ev]
    val df = MembershipStream.transitions(stream.toDF()).toDF()

    stream.addData(b1)
    val out1 = drainRun(df, ckpt, "append")
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3), r.getInt(4), r.getString(5))).toSet
    stream.addData(b2)
    val out2 = drainRun(df, ckpt, "append")
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3), r.getInt(4), r.getString(5))).toSet

    assert(out1 == Set((1L, "ch0", 1, 2, "changed"), (1L, "ch0", 2, 3, "changed")),
      s"run 1 transitions: $out1")
    // no loss: prev_rank 3 was learned in run 1; no duplication: run-1
    // transitions must not re-emit; user 2's first sighting emits nothing
    assert(out2 == Set((1L, "ch0", 3, 4, "changed")), s"run 2 after restart: $out2")
    val batch = MembershipStream.transitions((b1 ++ b2).toDF())
      .collect().map(t => (t.user_id, t.channel, t.prev_rank, t.new_rank, t.kind)).toSet
    assert((out1 ++ out2) == batch)
  }

  test("s_sessionize_gap: restarted session_window merges into the recovered open session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // run 1 leaves user 1 with an OPEN session (events at min 0, 10; gap
    // 30 min); run 2's min-20 event must merge into that recovered
    // session, and the min-600 event advances the watermark past its end
    // so the MERGED session is emitted exactly once, in run 2
    val b1 = Seq(evm(1, 1, "ch0", 0), evm(2, 1, "ch0", 10))
    val b2 = Seq(evm(3, 1, "ch0", 20), evm(4, 1, "ch0", 600))

    val ckpt = ckptDir("gap")
    val stream = MemoryStream[Ev]
    val df = EventStream.gapSessions(stream.toDF(), gap = "30 minutes",
      watermark = Some("1 hour"))

    stream.addData(b1)
    val out1 = drainRun(df, ckpt, "append")
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    stream.addData(b2)
    val out2 = drainRun(df, ckpt, "append")
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))

    assert(out1.isEmpty, s"run 1 must not emit an open session: $out1")
    // n_events = 3 proves the run-1 session state survived the restart
    // (lost state → 1; re-processed batch 1 → a duplicate session row)
    assert(out2 == Seq((1L, ts(0), 3L)), s"run 2 after restart: $out2")
    // union == the batch twin's CLOSED sessions (the min-600 session is
    // still open at shutdown, by construction)
    val batch = EventStream.gapSessions((b1 ++ b2).toDF(), gap = "30 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(batch == Set((1L, ts(0), 3L), (1L, ts(600 * 60), 1L)))
    assert((out1 ++ out2).toSet == batch.filter(_._2 == ts(0)))
  }

  test("s_stream_velocity: restarted windowed agg folds new events into recovered counts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // 4 events land in window [0, 15min) in run 1 (below the >5 burst
    // bar, nothing emitted); run 2 adds 3 more to the SAME window — only
    // the recovered aggregation state can reach velocity 7 — and a far
    // event advances the watermark to close the window
    val b1 = (1L to 4L).map(i => evm(i, i, "ch0", i - 1))
    val b2 = Seq(evm(5, 5, "ch0", 5), evm(6, 6, "ch0", 6), evm(7, 7, "ch0", 7),
      evm(8, 8, "chZ", 1300))

    val ckpt = ckptDir("velocity")
    val stream = MemoryStream[Ev]
    val df = VelocityStream.bursts(stream.toDF(), watermark = Some("10 hours"))

    stream.addData(b1)
    val out1 = drainRun(df, ckpt, "append")
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    stream.addData(b2)
    val out2 = drainRun(df, ckpt, "append")
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))

    assert(out1.isEmpty, s"run 1 must not emit an open window: $out1")
    // 7 = 4 recovered + 3 new: lost state → 3 (under the bar, no row);
    // re-processing run 1 → 11
    assert(out2 == Seq((ts(0), "ch0", 7L)), s"run 2 after restart: $out2")
    // == batch twin over all data (the chZ window has 1 event: filtered)
    val batch = VelocityStream.bursts((b1 ++ b2).toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert((out1 ++ out2).toSet == batch)
  }

  test("s_stream_cluster: restarted drift monitor folds into recovered window counts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val dim = 64
    val cent: Array[Array[Double]] = Array(Array.fill(dim)(0d), Array.fill(dim)(8d))
    def emb(id: Long, c: Int, minutes: Long) = EmbT(id,
      new Timestamp(t0 + minutes * 60000L),
      Seq.tabulate(dim)(d => cent(c)(d).toFloat + (if (d == 0) (id % 3).toFloat * 0.01f else 0f)))

    // window [0, 15min): 3 vectors near c0 in run 1, 2 more in run 2;
    // the far c1 vector advances the watermark to close the window
    val b1 = (0L until 3L).map(i => emb(i, 0, i))
    val b2 = Seq(emb(10, 0, 5), emb(11, 0, 6), emb(12, 1, 1300))

    val ckpt = ckptDir("cluster")
    val stream = MemoryStream[EmbT]
    val df = ClusterStream.clusterCounts(stream.toDF(), cent, watermark = Some("1 hour"))

    stream.addData(b1)
    val out1 = drainRun(df, ckpt, "append")
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
    stream.addData(b2)
    val out2 = drainRun(df, ckpt, "append")
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))

    assert(out1.isEmpty, s"run 1 must not emit an open window: $out1")
    // 5 = 3 recovered + 2 new (lost state → 2; re-processed → 8)
    assert(out2 == Seq((ts(0), 0, 5L)), s"run 2 after restart: $out2")
    // union == the batch twin's closed windows (the c1 window stays open)
    val batch = ClusterStream.clusterCounts((b1 ++ b2).toDF(), cent)
      .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSet
    assert(batch == Set((ts(0), 0, 5L), (ts(1300 * 60 - 1300 * 60 % 900), 1, 1L)))
    assert((out1 ++ out2).toSet == batch.filter(_._1 == ts(0)))
  }

  test("s_stream_dedup: restart from checkpoint neither re-emits nor forgets") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val b1 = Seq(
      Doc(1, "alpha beta gamma", ts(0)),
      Doc(2, "delta epsilon", ts(10)),
      Doc(3, "alpha beta gamma", ts(20))) // in-batch dup of 1
    val b2 = Seq(
      Doc(4, "ALPHA beta GAMMA  ", ts(30)), // dup of 1 — state must survive restart
      Doc(5, "zeta eta", ts(40)),
      Doc(6, "delta epsilon", ts(50))) // dup of 2 — ditto

    val ckpt = ckptDir("dedup")
    val stream = MemoryStream[Doc]
    val df = DedupStream.dedupStream(stream.toDF(), watermark = "10 minutes")

    stream.addData(b1)
    val out1 = drainRun(df, ckpt, "append").map(_.getAs[Long]("doc_id")).toSet
    stream.addData(b2) // arrives while "down"
    val out2 = drainRun(df, ckpt, "append").map(_.getAs[Long]("doc_id")).toSet

    assert(out1 == Set(1L, 2L), s"run 1 survivors: $out1")
    // no duplication: run 2 must not re-emit 1/2; no loss: 4 and 6 must
    // still be recognized as duplicates of run-1 docs
    assert(out2 == Set(5L), s"run 2 after restart: $out2")
    // union == batch twin over all data (first-arrival = min doc_id here)
    val batchSurvivors = DedupStream.survivors((b1 ++ b2).toDF())
      .collect().map(_.getLong(0)).toSet
    assert((out1 ++ out2) == batchSurvivors)
  }

  test("s_rollup_maintain: restarted rollup resumes counts without reprocessing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // (u1, ch0, week0) spans both runs; (u3, ch9) exists ONLY in run 1 —
    // if the restart reprocessed batch 1, its key would re-emit in run 2
    val b1 = Seq(ev(1, 1, "ch0", 0), ev(2, 1, "ch0", 1), ev(3, 1, "ch0", 2),
      ev(4, 3, "ch9", 0))
    val b2 = Seq(ev(5, 1, "ch0", 3), ev(6, 1, "ch0", 3), ev(7, 2, "ch1", 3))

    val ckpt = ckptDir("rollup")
    val stream = MemoryStream[Ev]
    val df = RollupStream.maintained(stream.toDF())

    stream.addData(b1)
    val out1 = drainRun(df, ckpt, "update")
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString) -> r.getLong(3)).toMap
    stream.addData(b2)
    val out2 = drainRun(df, ckpt, "update")
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString) -> r.getLong(3)).toMap

    assert(out1((1L, "ch0", "2024-01-01")) == 3L)
    assert(out1((3L, "ch9", "2024-01-01")) == 1L)
    // no loss: run 2's update incorporates run-1 state (3 + 2 = 5)
    assert(out2((1L, "ch0", "2024-01-01")) == 5L, s"state lost across restart: $out2")
    // no reprocessing: the run-1-only key must not re-emit
    assert(!out2.keySet.exists(_._2 == "ch9"), s"batch 1 was reprocessed: $out2")
    // merged MV (run-2 updates overlaid on run-1) == batch twin
    val merged = out1 ++ out2
    val batch = RollupStream.maintained((b1 ++ b2).toDF())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString) -> r.getLong(3)).toMap
    assert(merged == batch)
  }

  test("s_sketch_maintain: restarted sketch keeps folding into recovered HLL state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val b1 = Seq(ev(1, 1, "ch0", 0), ev(2, 2, "ch0", 1), ev(3, 3, "ch0", 2),
      ev(4, 7, "ch9", 0)) // run-1-only key
    val b2 = Seq(ev(5, 4, "ch0", 3), ev(6, 5, "ch0", 3), ev(7, 1, "ch1", 3))

    val ckpt = ckptDir("sketch")
    val stream = MemoryStream[Ev]
    val df = SketchStream.maintained(stream.toDF())

    stream.addData(b1)
    val out1 = drainRun(df, ckpt, "update")
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    stream.addData(b2)
    val out2 = drainRun(df, ckpt, "update")
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap

    assert(out1(("ch0", "2024-01-01")) == 3L)
    // no loss: the recovered sketch folds users 4,5 into {1,2,3} -> 5
    assert(out2(("ch0", "2024-01-01")) == 5L, s"sketch state lost across restart: $out2")
    assert(out2(("ch1", "2024-01-01")) == 1L)
    // no reprocessing: run-1-only channel must not re-emit
    assert(!out2.keySet.exists(_._1 == "ch9"), s"batch 1 was reprocessed: $out2")
    // merged estimates == batch twin over the union
    val batch = SketchStream.maintained((b1 ++ b2).toDF())
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    assert((out1 ++ out2) == batch)
  }
}
