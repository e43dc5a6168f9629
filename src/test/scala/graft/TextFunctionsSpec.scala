package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Behavioral spec pinning TextFunctions to the reference implementations
  * (chat_parser.categorize_message / parse_membership_rank,
  * feature_analysis.has_humor) on the cases those functions were written
  * for: YouTube shortcode chains, w-laughs, CJK/Cyrillic scripts, badge
  * text, humor substrings.
  */
class TextFunctionsSpec extends SparkSpec {

  private def run[T](texts: Seq[String], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] = {
    val s = spark
    import s.implicits._
    texts.toDF("t").select(f(col("t"))).collect().map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq
  }

  test("categorize matches chat_parser.categorize_message on its canonical cases") {
    val cases = Seq(
      ":_konkonmori::_konkonmori:" -> "emoji", // pure shortcode chain
      "こんにちは" -> "jp", // hiragana
      "カワイイ" -> "jp", // katakana
      "草" -> "jp", // han
      "ｗｗｗ" -> "jp", // w-laugh, full-width
      "www" -> "jp", // w-laugh, ascii
      "nice！" -> "jp", // jp punctuation
      "안녕하세요" -> "kr",
      "привет" -> "ru",
      "12345" -> "number",
      "hello world" -> "es_en_id",
      "   " -> null)
    val got = run(cases.map(_._1), TextFunctions.categorize(_))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"categorize('$in') = $g, want $want")
    }
  }

  test("membershipRank matches parse_membership_rank on badge texts") {
    val cases = Seq(
      "New member" -> 0,
      "Member (6 months)" -> 6,
      "Member (1 month)" -> 1,
      "Member (2 years)" -> 24,
      "Member (1 year)" -> 12,
      "Moderator" -> -1,
      "" -> -1)
    val got = run(cases.map(_._1), TextFunctions.membershipRank(_))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"membershipRank('$in') = $g, want $want")
    }
  }

  test("hasHumor matches feature_analysis.has_humor patterns") {
    val cases = Seq(
      "lol" -> true,
      "looool that was great" -> true, // 'looool' is in the humor list
      "loool alone" -> false, // 3 o's: matches neither the list nor any regex (reference-faithful)
      "hahaha" -> true,
      "草" -> true,
      "jajaja" -> true,
      "wkwkwk" -> true,
      "xd" -> true,
      "a normal comment" -> false,
      "water" -> false) // 'w' inside a word must not trigger
    val got = run(cases.map(_._1), TextFunctions.hasHumor(_))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"hasHumor('$in') = $g, want $want")
    }
  }

  test("langId distinguishes scripts and English stopwords") {
    val cases = Seq(
      "これはテストです" -> "ja",
      "한국어 문장" -> "ko",
      "русский текст" -> "ru",
      "the quick brown fox" -> "en",
      "zzz qqq" -> "unk")
    val got = run(cases.map(_._1), TextFunctions.langId(_))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"langId('$in') = $g, want $want")
    }
  }

  test("charEntropy: spam near zero, uniform text at ln(k), natural text in between") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "aaaaaaaaaa"),           // one symbol -> H = 0
      (2L, "abababababab"),         // two equiprobable -> H = ln 2
      (3L, "abcdabcdabcd"),         // four equiprobable -> H = ln 4
      (4L, ""),                     // empty -> (0, 0.0)
      (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val res = graft.operators.TextOps.charEntropyDocs(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(res(1L) == ((10L, 0.0)))
    assert(math.abs(res(2L)._2 - math.log(2)) < 1e-3)
    assert(math.abs(res(3L)._2 - math.log(4)) < 1e-3)
    assert(res(4L) == ((0L, 0.0)))
    assert(res(5L)._2 > 2.0 && res(5L)._2 < 3.5, s"natural text entropy: ${res(5L)._2}")
  }

  test("stripHtml removes every tag, unescapes entities, collapses whitespace") {
    val res = graft.operators.TextOps.stripHtmlDocs(graft.Fixtures.htmlDocs(Tables.documents(spark, sfDir)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(res.nonEmpty)
    res.foreach { case (id, (nTags, cleaned)) =>
      assert(!cleaned.contains("<html>") && !cleaned.contains("</p>"),
        s"doc $id: markup survived: $cleaned")
      assert(!cleaned.contains("  "), s"doc $id: whitespace not collapsed")
      id % 4 match {
        case 0 => assert(nTags == 9, s"doc $id: expected 9 tags, got $nTags")
        case 1 =>
          assert(nTags == 2)
          assert(cleaned.endsWith("<3"), s"doc $id: entity not unescaped: $cleaned")
        case 2 =>
          assert(nTags == 0)
          assert(cleaned.startsWith("x > y && y < z:"), s"doc $id: $cleaned")
        case _ => assert(nTags == 0)
      }
    }
  }

  test("parseQueryDocs matches parse_search_query on its operator grammar") {
    val s = spark
    import s.implicits._
    // one doc per injection arm: quoted channel + from, bare channel,
    // invalid from date (error), to date, no operators
    val docsDf = Seq(
      (0L, "spring karaoke stream", "en", "s"),
      (1L, "zatsudan archive", "en", "s"),
      (2L, "collab highlights", "en", "s"),
      (3L, "birthday live", "en", "s"),
      (4L, "outfit reveal", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = graft.operators.TextOps.parseQueryDocs(graft.Fixtures.queryDocs(docsDf)).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: channel:"Pekora Ch." from:2024-01-15 <text> — both extracted,
    // clean text is the original prefix (reference splice + strip)
    assert(out(0L).getString(2) == "Pekora Ch.")
    assert(out(0L).getDate(3).toString == "2024-01-15")
    assert(out(0L).getString(1) == "spring karaoke stream")
    assert(out(0L).isNullAt(5))
    // doc 1: bare channel form
    assert(out(1L).getString(2) == "chan_1")
    assert(out(1L).getString(1) == "zatsudan archive")
    // doc 2: from:2024-02-30 is not a real date — error, every field null
    assert(out(2L).getString(5) == "invalid from date: 2024-02-30")
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(2) && out(2L).isNullAt(3))
    // doc 3: to-date extracted, residual text keeps the trailing words
    assert(out(3L).getDate(4).toString == "2024-03-10")
    assert(out(3L).getString(1) == "birthday live  till then")
    // doc 4: no operators — text passes through trimmed
    assert(out(4L).getString(1) == "outfit reveal")
    assert(out(4L).isNullAt(2) && out(4L).isNullAt(3) && out(4L).isNullAt(4))
  }

  test("gopherRules: each rule trips on its designed violation, clean doc keeps") {
    val s = spark
    import s.implicits._
    val clean = (("the be to of and that have with " +
      Seq.fill(6)("solid plain words flow nicely here again ready").mkString(" ")))
    val df = Seq(
      (1L, clean),                                        // passes everything
      (2L, "too short to count"),                         // r_len (< 50 words)
      (3L, clean + " " + Seq.fill(60)("###").mkString(" ")), // r_symbol + r_alpha
      (4L, Seq.fill(60)("word").mkString(" ")),           // r_stop (no stopwords)
      (5L, ""))                                           // zero words: nothing passes
      .toDF("doc_id", "text")
    val r = graft.operators.TextOps.gopherRulesDocs(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"))
    assert(!r(2L).getAs[Boolean]("r_len") && !r(2L).getAs[Boolean]("keep"))
    assert(!r(3L).getAs[Boolean]("r_symbol") && !r(3L).getAs[Boolean]("r_alpha"))
    assert(!r(4L).getAs[Boolean]("r_stop") && r(4L).getAs[Boolean]("r_len"))
    assert(r(5L).getLong(1) == 0L && !r(5L).getAs[Boolean]("keep"))
  }
}
