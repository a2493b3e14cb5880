package graft

/** Closed-form checks for the unicode text surface: tokenizer boundary
  * behavior per script, language-ID on the real multi-script fixtures,
  * and the unicode dedup true-positive. Cross-engine parity is the
  * board's job; these pin the SEMANTICS (what the shared fragments must
  * compute) so a regex edit can't silently change segmentation.
  */
class UnicodeQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def toks(text: String): Seq[String] = {
    Seq(text).toDF("text").createOrReplaceTempView("uni_tok_probe")
    spark.sql(s"SELECT ${UnicodeQueries.uniTokens("spark", "text")} AS t FROM uni_tok_probe")
      .collect().head.getSeq[String](0)
  }

  test("tokenizer: CJK ideographs segment per character, kana and hangul too") {
    assert(toks("你好世界") === Seq("你", "好", "世", "界"))
    assert(toks("データです") === Seq("デ", "ー", "タ", "で", "す"))
    assert(toks("안녕하세요 세계") === Seq("안", "녕", "하", "세", "요", "세", "계"))
  }

  test("tokenizer: combining marks stay attached; digits and punctuation split") {
    // Devanagari नमस्ते carries a virama and a vowel sign (category Mn) —
    // \p{M} in the token class keeps the word whole
    assert(toks("नमस्ते दुनिया") === Seq("नमस्ते", "दुनिया"))
    assert(toks("l'eau 123 мир!") === Seq("l", "'", "eau", "123", "мир", "!"))
  }

  test("tokenizer: mixed Latin/CJK text splits at the script boundary") {
    assert(toks("spark引擎fast") === Seq("spark", "引", "擎", "fast"))
  }

  test("lang id classifies every multi-script fixture document correctly") {
    val fixture = UnicodeQueries.fixtureDocs
      .toDF("doc_id", "lang", "text")
    fixture.createOrReplaceTempView("documents_uni")
    val got = UnicodeQueries.langIdOver(spark).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    UnicodeQueries.fixtureDocs.foreach { case (id, lang, _) =>
      assert(got(id) === lang, s"doc $id: predicted ${got(id)}, truth $lang")
    }
  }

  test("lang id returns unknown for letterless text") {
    Seq((1L, "??", "12345 !!! 42"), (2L, "??", ""))
      .toDF("doc_id", "lang", "text").createOrReplaceTempView("documents_uni")
    val got = UnicodeQueries.langIdOver(spark).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(got(1L) === "unknown" && got(2L) === "unknown")
  }

  test("unicode dedup: the fixture's exact Cyrillic duplicate collapses to one group") {
    val dups = UnicodeQueries.fixtureDocs.groupBy(_._3).filter(_._2.size > 1)
    assert(dups.size === 1, "fixture must carry exactly one duplicated text")
    val ids = dups.head._2.map(_._1).sorted
    assert(ids === Seq(-103L, -101L).sorted)
  }
}
