package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.DedupStream

case class Doc(doc_id: Long, text: String, ts: Timestamp)

/** Streaming dedup: first arrival survives, later copies are dropped even
  * when they arrive in a LATER micro-batch (state crosses batch
  * boundaries), and the survivor set equals the batch twin's.
  */
class DedupStreamSpec extends SparkSpec {

  private val t0 = 1704067200000L
  private def doc(id: Long, text: String, offsetS: Long) =
    Doc(id, text, new Timestamp(t0 + offsetS * 1000L))

  test("cross-batch duplicates are dropped; survivors match first arrivals") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val batch1 = Seq(
      doc(1, "alpha beta gamma", 0),
      doc(2, "delta epsilon", 10),
      doc(3, "alpha beta gamma", 20)) // in-batch dup of 1
    val batch2 = Seq(
      doc(4, "ALPHA beta GAMMA  ", 30), // canonicalized dup of 1, later batch
      doc(5, "zeta eta", 40),
      doc(6, "delta epsilon", 50)) // dup of 2, later batch

    val stream = MemoryStream[Doc]
    val query = DedupStream.dedupStream(stream.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    stream.addData(batch1)
    query.processAllAvailable()
    stream.addData(batch2)
    query.processAllAvailable()

    val survived = s.table("dedup_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    query.stop()

    assert(survived == Set(1L, 2L, 5L))
  }

  test("batch twin picks the min doc_id per content group on testdata") {
    val docs = Tables.documents(spark, sfDir)
    val sv = DedupStream.survivors(graft.Fixtures.plantedDocs(docs))
    // every planted exact duplicate (doc_id + 2e7) must lose to its source
    assert(sv.filter(col("doc_id") >= 20000000L).count() == 0)
    // survivor count == distinct content count
    val dd = graft.Fixtures.plantedDocs(docs)
      .select(sha2(lower(trim(col("text"))), 256).as("h")).distinct().count()
    assert(sv.count() == dd)
  }
}
