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

  test("monthlyRefresh materializes the reference's MV set off the raw cache") {
    import graft.sources.MonthlyRefresh
    val logs = ChatLogSources.readChatLogs(spark, dir)
    val meta = ChatLogSources.readVideoMetadata(spark, dir)
    val chans = ChatLogSources.readChannels(spark, s"$dir/channels.json")
    val mvs = MonthlyRefresh.refreshAll(logs, meta, chans, "2023-11-01")
    // mv_user_monthly_activity: u2's two chanX videos merge into one month
    // row; gift-only u3 is excluded by the total > 0 filter
    val act = mvs("mv_user_monthly_activity").collect()
      .map(r => r.getAs[String]("user_id") -> r.getAs[Long]("monthly_message_count")).toMap
    assert(act == Map("u1" -> 2L, "u2" -> 2L))
    // chat_language_stats_mv: one chanX/November row, categories reconcile
    val ls = mvs("chat_language_stats_mv").collect()
    assert(ls.length == 1)
    val l = ls.head
    assert(l.getAs[Long]("jp_count") == 2L && l.getAs[Long]("emoji_count") == 1L
      && l.getAs[Long]("es_en_id_count") == 1L && l.getAs[Long]("total_messages") == 4L)
    // mv_user_language_per_month: non-emoji excludes u2's emoji message
    val ul = mvs("mv_user_language_per_month").collect()
      .map(r => r.getAs[String]("user_id") ->
        (r.getAs[Long]("total_jp_messages"), r.getAs[Long]("total_non_emoji_messages"))).toMap
    assert(ul == Map("u1" -> (2L, 2L), "u2" -> (0L, 1L)))
    // membership_data_summary: u2's member row (rank 0, class 0) outranks
    // the non-member sighting; gift-only u3 lands in the unknown class (-2);
    // three singleton ranks split the channel 33.33 / 33.33 / 33.33
    val ms = mvs("membership_data_summary").collect()
      .map(r => r.getAs[Int]("membership_rank") ->
        (r.getAs[Long]("membership_count"), r.getAs[Double]("percentage_total"))).toMap
    assert(ms == Map(2 -> (1L, 33.33), 0 -> (1L, 33.33), -2 -> (1L, 33.33)))
    assert(mvs("membership_data_summary").select("channel_group").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("GroupOne"))
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

  private def deleteTree(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteTree); f.delete()
  }

  test("fixture install: concurrent installers race safely, readers never see a partial dir") {
    // the BENCH_r06 failure mode: one process read the fixed fixture path
    // while another was (re)writing it non-atomically → empty glob. The
    // install protocol stages + atomically renames, so once ANY installer
    // succeeds the path is complete and never touched again.
    val root = new java.io.File(ChatLogSources.fixtureDir)
    deleteTree(root)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 8).map { _ =>
      new Thread(() =>
        try ChatLogSources.installFixture()
        catch { case t: Throwable => errors.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent install failed: ${errors.peek()}")
    assert(Files.exists(Paths.get(ChatLogSources.fixtureDir, "_COMPLETE")))
    // no staging residue left behind
    val residue = root.getParentFile.listFiles()
      .filter(_.getName.startsWith(root.getName + ".stage-"))
    assert(residue.isEmpty, s"staging residue: ${residue.mkString(",")}")
    // full read works and sees the complete fixture (3 videos x 12 lines)
    assert(ChatLogSources.readChatLogs(spark, ChatLogSources.fixtureDir).count() == 36L)
  }

  test("fixture install: a stale-VERSION marker is replaced, not served") {
    val root = new java.io.File(ChatLogSources.fixtureDir)
    deleteTree(root)
    // an install from an older generator: complete layout, wrong version
    Files.createDirectories(Paths.get(ChatLogSources.fixtureDir, "chat_logs"))
    Files.writeString(Paths.get(ChatLogSources.fixtureDir, "chat_logs", "stale.jsonl.gz"), "")
    Files.writeString(Paths.get(ChatLogSources.fixtureDir, "_COMPLETE"), "graft-fixture:0:old")
    ChatLogSources.installFixture()
    assert(Files.readString(Paths.get(ChatLogSources.fixtureDir, "_COMPLETE"))
      == ChatLogSources.fixtureVersion)
    assert(!Files.exists(Paths.get(ChatLogSources.fixtureDir, "chat_logs", "stale.jsonl.gz")))
    assert(ChatLogSources.readChatLogs(spark, ChatLogSources.fixtureDir).count() == 36L)
    // no lock residue
    assert(!Files.exists(Paths.get(ChatLogSources.fixtureDir + ".lock")))
  }

  test("fixture install: replaces a half-written legacy corpse, then idempotent (no rewrite)") {
    val root = new java.io.File(ChatLogSources.fixtureDir)
    deleteTree(root)
    // a legacy/killed writer left a partial dir without the marker
    Files.createDirectories(Paths.get(ChatLogSources.fixtureDir, "chat_logs"))
    Files.writeString(Paths.get(ChatLogSources.fixtureDir, "chat_logs", "junk.jsonl.gz"), "")
    ChatLogSources.installFixture()
    val marker = Paths.get(ChatLogSources.fixtureDir, "_COMPLETE")
    assert(Files.exists(marker), "corpse must be replaced by a complete fixture")
    assert(!Files.exists(Paths.get(ChatLogSources.fixtureDir, "chat_logs", "junk.jsonl.gz")))
    assert(ChatLogSources.readChatLogs(spark, ChatLogSources.fixtureDir).count() == 36L)
    // second call takes the fast path: nothing on disk is touched
    val mtime = Files.getLastModifiedTime(marker)
    ChatLogSources.installFixture()
    assert(Files.getLastModifiedTime(marker) == mtime, "repeat install must not rewrite")
    // and the gate entry end-to-end still produces the rollup
    assert(ChatLogSources.fixtureRollup(spark).count() > 0)
  }

  test("private read copy is byte-identical to the shared fixture the oracle reads") {
    ChatLogSources.installFixture()
    val priv = new java.io.File(ChatLogSources.privateFixtureReady)
    val shared = new java.io.File(ChatLogSources.fixtureDir)
    def files(root: java.io.File): Map[String, Array[Byte]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).map { f =>
        root.toPath.relativize(f.toPath).toString ->
          Files.readAllBytes(f.toPath)
      }.toMap
    }
    val p = files(priv)
    // the shared dir additionally carries the _COMPLETE marker
    val s = files(shared) - "_COMPLETE"
    assert(p.keySet == s.keySet, s"layout mismatch: ${p.keySet} vs ${s.keySet}")
    p.foreach { case (name, bytes) =>
      assert(java.util.Arrays.equals(bytes, s(name)), s"content mismatch in $name")
    }
  }

  test("fixtureRollup survives continuous replacement of the SHARED dir (the bench-crash race)") {
    // the r6/r7 tail crash: another process deleting/reinstalling the
    // shared fixture while THIS process's Spark analysis globs it. The
    // read path now uses a process-private copy, so shared-dir chaos at
    // any moment must be invisible to the gate entry.
    ChatLogSources.fixtureRollup(spark).count() // force both installs once
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val chaos = new Thread(() => {
      val root = new java.io.File(ChatLogSources.fixtureDir)
      while (!stop.get()) {
        deleteTree(root) // mid-replacement window: dir absent entirely
        Files.createDirectories(Paths.get(ChatLogSources.fixtureDir, "chat_logs"))
        Thread.sleep(1)
      }
    })
    chaos.start()
    try {
      (0 until 5).foreach { _ =>
        assert(ChatLogSources.fixtureRollup(spark).count() > 0)
      }
    } finally { stop.set(true); chaos.join() }
    // restore a complete shared fixture for later tests / the oracle
    deleteTree(new java.io.File(ChatLogSources.fixtureDir))
    ChatLogSources.installFixture()
    assert(Files.exists(Paths.get(ChatLogSources.fixtureDir, "_COMPLETE")))
  }
}
