package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.sources.ChatLogSources

/** End-to-end read of the reference's cache layout: the spec WRITES the
  * exact on-disk format the reference produces (gzipped JSON-lines chat
  * logs named by video, per-channel JSON metadata maps, channels.json)
  * into a temp dir, then reads it back through the source module and pins
  * schema, file-name recovery, and the rollup bridge.
  */
class ChatLogSourcesSpec extends SparkSpec {

  private def writeGz(path: String, lines: Seq[String]): Unit = {
    val os = new GZIPOutputStream(Files.newOutputStream(Paths.get(path)))
    os.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    os.close()
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-cache").toString
    Files.createDirectories(Paths.get(s"$d/chat_logs"))
    Files.createDirectories(Paths.get(s"$d/videos"))
    def chat(user: String, ts: Double, rank: Int, cat: String, msg: String) =
      s"""{"user_id": "$user", "username": "name-$user", "timestamp": $ts, "membership_rank": $rank, "message_category": "$cat", "message": "$msg", "message_type": "chat", "gifter": null}"""
    def member(user: String, ts: Double, rank: Int, tpe: String, gifter: String) =
      s"""{"user_id": "$user", "username": "name-$user", "timestamp": $ts, "membership_rank": $rank, "message_category": null, "message": "", "message_type": "$tpe", "gifter": ${if (gifter == null) "null" else s""""$gifter""""}}"""
    writeGz(s"$d/chat_logs/vidA.jsonl.gz", Seq(
      chat("u1", 1700000000.5, 2, "jp", "konnichiwa"),
      chat("u1", 1700000010.0, 2, "jp", "mata ne"),
      chat("u2", 1700000020.0, -1, "emoji", ":_wave:"),
      member("u3", 1700000030.0, -2, "gift_member", "u9")))
    writeGz(s"$d/chat_logs/vidB.jsonl.gz", Seq(
      chat("u2", 1700090000.0, 0, "es_en_id", "hello there"),
      member("u2", 1700090100.0, 0, "new_member", null)))
    Files.writeString(Paths.get(s"$d/videos/chanX.json"),
      """{"vidA": {"title": "stream A", "end_time": "2023-11-14 22:13:20", "duration": 7200},
        | "vidB": {"title": "stream B", "end_time": "2023-11-15 23:15:00", "duration": 5400}}""".stripMargin)
    Files.writeString(Paths.get(s"$d/channels.json"),
      """{"GroupOne": {"Alpha": "chanX", "Beta": "chanY"}, "GroupTwo": {"Gamma": "chanZ"}}""")
    d
  }

  test("chat logs: explicit schema, video_id from file name, epoch-seconds ts") {
    val logs = ChatLogSources.readChatLogs(spark, dir).cache()
    assert(logs.count() == 6)
    assert(logs.select("video_id").distinct().collect().map(_.getString(0)).toSet
      == Set("vidA", "vidB"))
    val first = logs.filter(col("user_id") === "u1" && col("timestamp") === 1700000000.5).first()
    assert(first.getAs[String]("video_id") == "vidA")
    assert(first.getAs[Int]("membership_rank") == 2)
    assert(first.getAs[java.sql.Timestamp]("ts").getTime == 1700000000500L)
    // membership events: empty message, null category, gifter carried
    val gift = logs.filter(col("message_type") === "gift_member").collect()
    assert(gift.length == 1 && gift.head.getAs[String]("gifter") == "u9")
    logs.unpersist()
  }

  test("video metadata: map file explodes to one row per video with channel from file name") {
    val meta = ChatLogSources.readVideoMetadata(spark, dir).collect()
    assert(meta.length == 2)
    assert(meta.forall(_.getAs[String]("channel_id") == "chanX"))
    val a = meta.find(_.getAs[String]("video_id") == "vidA").get
    assert(a.getAs[String]("title") == "stream A" && a.getAs[Long]("duration_seconds") == 7200L)
  }

  test("channels.json flattens to (group, name, id) rows") {
    val ch = ChatLogSources.readChannels(spark, s"$dir/channels.json").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ch == Set(("GroupOne", "Alpha", "chanX"), ("GroupOne", "Beta", "chanY"),
      ("GroupTwo", "Gamma", "chanZ")))
  }

  test("userVideoRollup bridges raw logs to the user_data build") {
    val logs = ChatLogSources.readChatLogs(spark, dir)
    val r = ChatLogSources.userVideoRollup(logs).collect()
      .map(x => (x.getAs[String]("user_id"), x.getAs[String]("video_id")) -> x).toMap
    val u1 = r(("u1", "vidA"))
    assert(u1.getAs[Long]("jp_count") == 2L && u1.getAs[Long]("total_message_count") == 2L)
    assert(u1.getAs[Int]("membership_rank") == 2)
    // gift-only user: zero chat lines, unknown (-2) rank filtered from max
    val u3 = r(("u3", "vidA"))
    assert(u3.getAs[Long]("total_message_count") == 0L)
    assert(u3.getAs[Boolean]("is_gift"))
    assert(u3.isNullAt(u3.fieldIndex("membership_rank")))
    // hours: 7200+5400 seconds in the same November → 3.5 h
    val hours = ChatLogSources.streamingHours(
      ChatLogSources.readVideoMetadata(spark, dir)).collect()
    assert(hours.length == 1 && math.abs(hours.head.getAs[Double]("hours") - 3.5) < 1e-9)
  }
}
