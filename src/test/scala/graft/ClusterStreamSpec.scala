package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.ClusterStream

/** Streaming ≡ batch for the cluster-drift monitor, state accumulates
  * across micro-batches, append mode emits a window once when the
  * watermark closes it, and a cluster-mix SHIFT between windows (the
  * drift signal) is visible in the emitted counts.
  */
class ClusterStreamSpec extends SparkSpec {

  private val dim = 64
  private val t0 = 1704067200000L // 2024-01-01 00:00 UTC, a window boundary

  // two fixed, well-separated centroids — trained offline in the real flow
  private val cent: Array[Array[Double]] =
    Array(Array.fill(dim)(0d), Array.fill(dim)(8d))

  private def near(c: Int, jit: Float): Seq[Float] =
    Seq.tabulate(dim)(d => cent(c)(d).toFloat + (if (d == 0) jit else 0f))

  private def row(id: Long, c: Int, minutes: Long): EmbT =
    EmbT(id, new Timestamp(t0 + minutes * 60000L), near(c, (id % 3).toFloat * 0.01f))

  test("streaming counts equal the batch twin; drift between windows is visible") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // window 0 (min 0-14): 6 near c0, 2 near c1 — window 1 (min 15-29):
    // 2 near c0, 6 near c1 — the mix flips: that flip IS the drift signal
    val rows =
      (0L until 6L).map(i => row(i, 0, i)) ++
      (6L until 8L).map(i => row(i, 1, i - 6)) ++
      (10L until 12L).map(i => row(i, 0, 15 + (i - 10))) ++
      (12L until 18L).map(i => row(i, 1, 15 + (i - 12)))

    val stream = MemoryStream[EmbT]
    stream.addData(rows)
    val q = ClusterStream.clusterCounts(stream.toDF(), cent, watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("drift_all")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = s.table("drift_all").collect().map(_.toSeq).toSet
    q.stop()

    val batch = ClusterStream.clusterCounts(rows.toDF(), cent).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    val byWindow = batch.groupBy(_.head).map { case (w, g) =>
      w -> g.map(r => r(1) -> r(2)).toMap
    }
    assert(byWindow(new Timestamp(t0)) == Map(0 -> 6L, 1 -> 2L))
    assert(byWindow(new Timestamp(t0 + 15 * 60000L)) == Map(0 -> 2L, 1 -> 6L))
  }

  test("append mode: counts accumulate across micro-batches, emitted once on close") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val stream = MemoryStream[EmbT]
    val q = ClusterStream.clusterCounts(stream.toDF(), cent, watermark = Some("15 minutes"))
      .writeStream.format("memory").queryName("drift_append")
      .outputMode("append").start()

    stream.addData((0L until 3L).map(i => row(i, 0, i)))
    q.processAllAvailable()
    assert(s.table("drift_append").count() == 0, "window still open: nothing emitted")

    // two more members across the micro-batch boundary, then a row far
    // ahead that closes window 0
    stream.addData(Seq(row(3, 0, 5), row(4, 0, 9), row(99, 1, 60)))
    q.processAllAvailable()
    val out = s.table("drift_append").collect()
    q.stop()

    assert(out.length == 1, "exactly one closed-window row")
    assert(out(0).getTimestamp(0) == new Timestamp(t0))
    assert(out(0).getInt(1) == 0 && out(0).getLong(2) == 5L,
      "count must accumulate 3+2 across micro-batches")
  }

  test("empty centroid set degrades to an empty result, streaming-safe schema") {
    val s = spark
    import s.implicits._
    val rows = Seq(row(0, 0, 0), row(1, 1, 1))
    val out = ClusterStream.clusterCounts(rows.toDF(), Array.empty)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq == Seq("window_start", "cluster", "n"))
  }
}

case class EmbT(vec_id: Long, ts: Timestamp, embedding: Seq[Float])
