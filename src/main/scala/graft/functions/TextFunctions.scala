package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text classifiers/scorers as pure `Column` expression trees (regexp_*,
  * aggregate, transform — all codegen'd built-ins, no UDFs), each with a
  * DuckDB-dialect SQL twin defined next to it so Spark and oracle cannot
  * drift.
  *
  * Dialect note: Spark compiles to Java regex (`\p{IsHiragana}` script
  * syntax), DuckDB to RE2 (`\p{Hiragana}`); the *semantics* are pinned to
  * be identical. Reference behavior:
  * mipacd/HoloChatStats `data_ingestion/utils/chat_parser.py:60`
  * (categorize_message), `:11` (parse_membership_rank),
  * `data_ingestion/utils/feature_analysis.py:7` (has_humor).
  */
object TextFunctions {

  /** Java's default `\s` class spelled explicitly, for DuckDB twins: RE2's
    * `\s` lacks U+000B (vertical tab), so every oracle regex uses these
    * classes instead of `\s`/`\S` — otherwise a VT inside text makes the
    * two engines tokenize differently and fails the gate.
    */
  val WS_SQL = "[ \\t\\n\\x0B\\f\\r]"
  val NWS_SQL = "[^ \\t\\n\\x0B\\f\\r]"

  // Java (Spark) vs RE2 (DuckDB) script-class spellings.
  private val jpJ = "[\\p{IsHiragana}\\p{IsKatakana}\\p{IsHan}]"
  private val jpD = "[\\p{Hiragana}\\p{Katakana}\\p{Han}]"
  private val krJ = "[\\p{IsHangul}]"; private val krD = "[\\p{Hangul}]"
  private val ruJ = "[\\p{IsCyrillic}]"; private val ruD = "[\\p{Cyrillic}]"

  // ---- categorize_message (chat_parser.py:60) ------------------------------
  // Cascade: pure-emoji -> jp (script | ！？ | ^[wｗ]+$) -> kr -> ru ->
  // numeric -> es_en_id.
  private def isPureEmojiC(c: Column): Column = {
    val noShort = regexp_replace(c, ":[^:\\s]+:", "")
    val noEmoji = regexp_replace(noShort, "[\\p{So}]", "")
    val remainder = regexp_replace(noEmoji, "[\\s\\x{200D}\\x{FE0E}\\x{FE0F}]", "")
    remainder === "" && (noShort =!= c || noEmoji =!= noShort)
  }
  private def isPureEmojiSql(e: String): String = {
    val noShort = s"regexp_replace($e, ':[^: \\t\\n\\x0B\\f\\r]+:', '', 'g')"
    val noEmoji = s"regexp_replace($noShort, '[\\p{So}]', '', 'g')"
    val remainder = s"regexp_replace($noEmoji, '[ \\t\\n\\x0B\\f\\r\\x{200D}\\x{FE0E}\\x{FE0F}]', '', 'g')"
    s"($remainder = '' AND ($noShort <> $e OR $noEmoji <> $noShort))"
  }

  def categorize(c: Column): Column = {
    val lo = lower(trim(c))
    when(c.isNull || trim(c) === "", lit(null).cast("string"))
      .when(isPureEmojiC(trim(c)), "emoji")
      // \z, not $: Java's $ matches BEFORE a trailing newline while
      // DuckDB's RE2 $ means absolute end — on "123\n" a $-anchored
      // pattern would classify 'number' here and 'es_en_id' in the
      // oracle. \z is Java's absolute-end anchor = RE2's $.
      .when(lo.rlike(jpJ) || lo.rlike("[！？]") || lo.rlike("^[wｗ]+\\z"), "jp")
      .when(lo.rlike(krJ), "kr")
      .when(lo.rlike(ruJ), "ru")
      .when(lo.rlike("^[0-9]+\\z"), "number")
      .otherwise("es_en_id")
  }
  def categorizeSql(e: String): String = {
    val lo = s"lower(trim($e))"
    s"""CASE WHEN $e IS NULL OR trim($e) = '' THEN NULL
       | WHEN ${isPureEmojiSql(s"trim($e)")} THEN 'emoji'
       | WHEN regexp_matches($lo, '$jpD') OR regexp_matches($lo, '[！？]')
       |      OR regexp_matches($lo, '^[wｗ]+$$') THEN 'jp'
       | WHEN regexp_matches($lo, '$krD') THEN 'kr'
       | WHEN regexp_matches($lo, '$ruD') THEN 'ru'
       | WHEN regexp_matches($lo, '^[0-9]+$$') THEN 'number'
       | ELSE 'es_en_id' END""".stripMargin.replace("\n", "")
  }

  // ---- parse_membership_rank (chat_parser.py:11) ---------------------------
  // '' / null -> -1; 'new member' -> 0; 'N month(s)' -> N; 'N year(s)' -> 12N.
  def membershipRank(c: Column): Column = {
    val lo = lower(trim(coalesce(c, lit(""))))
    val num = regexp_extract(lo, "(\\d+)\\s*(month|year)", 1)
    val unit = regexp_extract(lo, "(\\d+)\\s*(month|year)", 2)
    when(lo === "", -1)
      .when(lo.contains("new member"), 0)
      .when(num =!= "", when(unit === "year", num.cast("int") * 12).otherwise(num.cast("int")))
      .otherwise(-1)
  }
  def membershipRankSql(e: String): String = {
    val lo = s"lower(trim(coalesce($e, '')))"
    val num = s"regexp_extract($lo, '(\\d+)$WS_SQL*(month|year)', 1)"
    val unit = s"regexp_extract($lo, '(\\d+)$WS_SQL*(month|year)', 2)"
    s"""CASE WHEN $lo = '' THEN -1
       | WHEN contains($lo, 'new member') THEN 0
       | WHEN $num <> '' THEN CASE WHEN $unit = 'year'
       |   THEN CAST($num AS INT) * 12 ELSE CAST($num AS INT) END
       | ELSE -1 END""".stripMargin.replace("\n", "")
  }

  // ---- has_humor (feature_analysis.py:7) -----------------------------------
  private val humorList = Seq(
    "草", "茶葉", "_fbkcha", "_lol", "lmao", "lmfao", "haha", "🤣", "😆",
    "jaja", "笑", "xd", "wkwk", "ｗ", "rofl", "kek", "looool", "xddd")

  def hasHumor(c: Column): Column = {
    val anySub = humorList.map(s => c.contains(s)).reduce(_ || _)
    val hasJp = c.rlike(jpJ)
    val wEnd = hasJp && c.rlike("ｗ+\\z") // \z = RE2 $ (see categorize)
    val hasLol = c.rlike("(?i)\\blol+\\b")
    val repeated = c.rlike("(?i)(ha){2,}|(w{2,})|(o?l{2,}o+l+)")
    anySub || hasLol || wEnd || repeated
  }
  def hasHumorSql(e: String): String = {
    val anySub = humorList.map(s => s"contains($e, '$s')").mkString(" OR ")
    s"""($anySub
       | OR regexp_matches($e, '(?i)\\blol+\\b')
       | OR (regexp_matches($e, '$jpD') AND regexp_matches($e, 'ｗ+$$'))
       | OR regexp_matches($e, '(?i)(ha){2,}|(w{2,})|(o?l{2,}o+l+)'))""".stripMargin.replace("\n", "")
  }

  // ---- language ID heuristic (training-data op #45) ------------------------
  // Script cascade, then stopword evidence for English, else unk.
  def langId(c: Column): Column = {
    val lo = lower(c)
    when(c.isNull, lit(null).cast("string"))
      .when(lo.rlike(jpJ), "ja")
      .when(lo.rlike(krJ), "ko")
      .when(lo.rlike(ruJ), "ru")
      .when(lo.rlike("\\b(the|and|of|to|in|is|it|for|that|with)\\b"), "en")
      .otherwise("unk")
  }
  def langIdSql(e: String): String = {
    val lo = s"lower($e)"
    s"""CASE WHEN $e IS NULL THEN NULL
       | WHEN regexp_matches($lo, '$jpD') THEN 'ja'
       | WHEN regexp_matches($lo, '$krD') THEN 'ko'
       | WHEN regexp_matches($lo, '$ruD') THEN 'ru'
       | WHEN regexp_matches($lo, '\\b(the|and|of|to|in|is|it|for|that|with)\\b') THEN 'en'
       | ELSE 'unk' END""".stripMargin.replace("\n", "")
  }

  // ---- token counting (training-data op #47) -------------------------------
  /** Whitespace tokens. */
  def wsTokenCount(c: Column): Column = regexp_count(c, lit("\\S+"))
  def wsTokenCountSql(e: String): String = s"len(regexp_extract_all($e, '$NWS_SQL+'))"

  /** BPE-ish pre-tokenizer: letter runs, single digits, single symbols. */
  private val bpePat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  private val bpePatSql = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"
  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(bpePat))
  def bpeTokenCountSql(e: String): String = s"len(regexp_extract_all($e, '$bpePatSql'))"

  // ---- quality score (training-data op #46) --------------------------------
  // Blend of length, stopword-ratio proximity to 0.4, symbol ratio, mean
  // word length — all exact double arithmetic (no transcendentals).
  def qualityScore(c: Column): Column = {
    val words = wsTokenCount(c).cast("double")
    val stops = regexp_count(lower(c), lit("\\b(the|a|and|of|to|in|is|it|for|on)\\b")).cast("double")
    val punct = regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("double")
    val chars = length(regexp_replace(c, "\\s", "")).cast("double")
    val lenScore = least(words / 100d, lit(1d))
    val stopScore = lit(1d) - least(abs(stops / words - 0.4d) / 0.4d, lit(1d))
    val punctScore = lit(1d) - least(punct / chars * 5d, lit(1d))
    val mwlScore = least(chars / words / 8d, lit(1d))
    when(words === 0d, 0d)
      .otherwise(lenScore * 0.25d + stopScore * 0.25d + punctScore * 0.25d + mwlScore * 0.25d)
  }
  def qualityScoreSql(e: String): String = {
    val words = s"CAST(len(regexp_extract_all($e, '$NWS_SQL+')) AS DOUBLE)"
    val stops = s"CAST(len(regexp_extract_all(lower($e), '\\b(the|a|and|of|to|in|is|it|for|on)\\b')) AS DOUBLE)"
    val punct = s"CAST(len(regexp_extract_all($e, '[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]')) AS DOUBLE)"
    val chars = s"CAST(length(regexp_replace($e, '$WS_SQL', '', 'g')) AS DOUBLE)"
    s"""CASE WHEN $words = 0 THEN 0 ELSE
       |  least($words / 100, 1) * 0.25
       |  + (1 - least(abs($stops / $words - 0.4) / 0.4, 1)) * 0.25
       |  + (1 - least($punct / $chars * 5, 1)) * 0.25
       |  + least($chars / $words / 8, 1) * 0.25 END""".stripMargin.replace("\n", "")
  }

  // ---- Gopher-style rule filter (training-data op #81) ---------------------
  /** The published Gopher repetition/quality RULES (Rae et al. 2021, §A1.1)
    * as explicit per-document flags — distinct from [[qualityScore]], which
    * BLENDS signals into one number: a corpus build filters on hard rules
    * first, then ranks survivors by score. Thresholds follow the paper
    * (word count 50..100k, mean word length 3..10, symbol-to-word < 0.1,
    * ≥ 80% words with an alphabetic char, ≥ 2 distinct stopwords).
    * All in-row exact double arithmetic — zero exchanges (t_ invariant).
    */
  private val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherWords(c: Column): Column = wsTokenCount(c).cast("double")
  def gopherMwl(c: Column): Column =
    length(regexp_replace(c, "\\s", "")).cast("double") / gopherWords(c)
  def gopherSymbolRatio(c: Column): Column =
    (regexp_count(c, lit("#")) + regexp_count(c, lit("\\.\\.\\.")))
      .cast("double") / gopherWords(c)
  def gopherAlphaFrac(c: Column): Column =
    regexp_count(c, lit("\\S*[A-Za-z]\\S*")).cast("double") / gopherWords(c)
  def gopherStopCount(c: Column): Column =
    gopherStops.map(s => when(lower(c).rlike(s"\\b$s\\b"), 1).otherwise(0))
      .reduce[Column](_ + _).cast("long")

  def gopherWordsSql(e: String): String =
    s"CAST(len(regexp_extract_all($e, '$NWS_SQL+')) AS DOUBLE)"
  def gopherMwlSql(e: String): String =
    s"CAST(length(regexp_replace($e, '$WS_SQL', '', 'g')) AS DOUBLE) / ${gopherWordsSql(e)}"
  def gopherSymbolRatioSql(e: String): String =
    s"CAST(len(regexp_extract_all($e, '#')) + len(regexp_extract_all($e, '\\.\\.\\.')) AS DOUBLE) / ${gopherWordsSql(e)}"
  def gopherAlphaFracSql(e: String): String =
    s"CAST(len(regexp_extract_all($e, '$NWS_SQL*[A-Za-z]$NWS_SQL*')) AS DOUBLE) / ${gopherWordsSql(e)}"
  def gopherStopCountSql(e: String): String =
    s"CAST(${gopherStops.map(s => s"(CASE WHEN regexp_matches(lower($e), '\\b$s\\b') THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT)"

  /** The five Gopher-rule predicates at the canonical thresholds
    * (50–100k words, mean word length 3–10, symbol ratio < 0.1, alpha
    * fraction > 0.8, ≥ 2 distinct stopwords) — the SINGLE definition of
    * the thresholds, consumed by both `TextOps.gopherRulesDocs` (per-rule
    * flags) and `Pipeline.datasetCard` (keep rate); a threshold change
    * here moves both surfaces in step. Zero-word docs fail every
    * word-derived rule (the ratios are NULL-div there otherwise).
    */
  def gopherRuleCols(t: Column): Seq[Column] = {
    val words = gopherWords(t)
    val zero = words === 0d
    Seq(
      !zero && words >= 50d && words <= 100000d,
      !zero && gopherMwl(t) >= 3d && gopherMwl(t) <= 10d,
      !zero && gopherSymbolRatio(t) < 0.1d,
      !zero && gopherAlphaFrac(t) > 0.8d,
      gopherStopCount(t) >= 2L)
  }

  /** All five rules ANDed — the Gopher keep decision. */
  def gopherKeep(t: Column): Column = gopherRuleCols(t).reduce(_ && _)

  def gopherRuleSqls(e: String): Seq[String] = {
    val w = gopherWordsSql(e)
    Seq(
      s"($w > 0 AND $w >= 50 AND $w <= 100000)",
      s"($w > 0 AND ${gopherMwlSql(e)} >= 3 AND ${gopherMwlSql(e)} <= 10)",
      s"($w > 0 AND ${gopherSymbolRatioSql(e)} < 0.1)",
      s"($w > 0 AND ${gopherAlphaFracSql(e)} > 0.8)",
      s"(${gopherStopCountSql(e)} >= 2)")
  }

  def gopherKeepSql(e: String): String =
    gopherRuleSqls(e).mkString("(", " AND ", ")")

  // ---- document fingerprint (training-data op #48) -------------------------
  /** Canonical-token md5 fingerprint (whitespace-normalization invariant). */
  def md5Fingerprint(c: Column): Column =
    md5(concat_ws(" ", split(lower(trim(c)), "\\s+")))
  def md5FingerprintSql(e: String): String =
    s"md5(array_to_string(regexp_extract_all(lower(trim($e)), '$NWS_SQL+'), ' '))"

  /** Order-sensitive polynomial rolling hash: left fold
    * acc = (acc * 131 + tokenId) mod 1e9+7 where tokenId is a 24-bit
    * md5-derived word id — exact BIGINT arithmetic in both engines.
    */
  def polyFingerprint(c: Column): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    val ids = transform(toks, t => conv(substring(md5(t), 1, 6), 16, 10).cast("long"))
    aggregate(ids, lit(0L), (acc, x) => (acc * 131L + x) % 1000000007L)
  }
  def polyFingerprintSql(e: String): String = {
    val toks = s"regexp_extract_all(lower(trim($e)), '$NWS_SQL+')"
    val ids = s"list_transform($toks, t -> CAST(concat('0x', substr(md5(t), 1, 6)) AS BIGINT))"
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $ids), (acc, x) -> (acc * 131 + x) % 1000000007)"
  }
}
