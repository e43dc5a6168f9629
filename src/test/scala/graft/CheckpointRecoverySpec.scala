package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{DedupStream, RollupStream, SketchStream}

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
