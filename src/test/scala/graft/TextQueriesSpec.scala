package graft

/** Closed-form checks for the TextQueries SQL constants on hand-built
  * corpora: an exact power-law corpus recovers the Zipf exponent.
  */
class TextQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def asDocs(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("documents")
    // perplexityOver reads the multi-script union view; specs test the
    // closed form on exactly these docs, so bind both names to the frame
    df.createOrReplaceTempView("documents_uni")
  }

  test("Zipf fit recovers slope -1 on a freq = C/rank corpus") {
    // frequencies 60/r for ranks 1..5: 60, 30, 20, 15, 12 — an exact
    // power law with exponent -1 (up to the milli-ln quantization).
    val words = Seq("aa" -> 60, "bb" -> 30, "cc" -> 20, "dd" -> 15, "ee" -> 12)
    asDocs(Seq(words.flatMap { case (w, c) => Seq.fill(c)(w) }.mkString(" ")))
    val row = spark.sql(TextQueries.zipfSql).collect().head
    assert(row.getAs[Long]("n_terms") === 5L)
    val slope = row.getAs[Long]("zipf_slope_milli")
    assert(slope >= -1005L && slope <= -995L, s"slope $slope not ~ -1000")
  }

  test("Zipf fit flags a uniform (template-spam) corpus with slope ~ 0") {
    // every word equally frequent: log-log line is flat
    asDocs(Seq((1 to 20).map(i => s"w$i w$i w$i").mkString(" ")))
    val row = spark.sql(TextQueries.zipfSql).collect().head
    assert(row.getAs[Long]("n_terms") === 20L)
    assert(row.getAs[Long]("zipf_slope_milli") === 0L)
  }

  test("Zipf fit caps the model table at 500 terms") {
    // 600 distinct words, frequency 601-i for word i: only the top 500
    // ranks enter the moments
    val text = (1 to 600).flatMap(i => Seq.fill(601 - i)(s"t$i")).mkString(" ")
    asDocs(Seq(text))
    val row = spark.sql(TextQueries.zipfSql).collect().head
    assert(row.getAs[Long]("n_terms") === 500L)
  }

  // ------------------------------------------- perplexity filter (r14)

  private def perplexities(texts: Seq[String]): Map[Long, (Long, Long)] =
    { asDocs(texts)
      TextQueries.perplexityOver(spark).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_avg_micro")))).toMap }

  test("perplexity: a single-word-vocabulary corpus scores exactly zero nll") {
    // one bigram type (a,a): c12 = c1, V = 1 -> every term is
    // ln((c1+1)/(c12+1)) = ln 1 = 0, exactly, through the integer path
    val got = perplexities(Seq("a a a a", "a a a"))
    assert(got(0L) === ((3L, 0L)) && got(1L) === ((2L, 0L)))
  }

  test("perplexity: exact closed form on a two-word alternation") {
    // 'a b a b a': bigrams ab x2, ba x2; V = 2; c1(a) = c1(b) = 2 ->
    // every term is ln((2+2)/(2+1)) = ln(4/3); avg = floor(ln(4/3)*1e6)
    val got = perplexities(Seq("a b a b a"))
    assert(got(0L) === ((4L, 287682L)), s"got ${got(0L)}")
  }

  test("perplexity: rare-bigram documents score above common-bigram documents") {
    // 10 fluent docs share one template; one weird doc uses bigrams seen
    // only once — the filter must rank it strictly higher, and docs with
    // fewer than 2 tokens drop out entirely
    val fluent = Seq.fill(10)("the cat sat on the mat")
    val got = perplexities(fluent ++ Seq("mat the on cat sat the", "x"))
    assert(!got.contains(11L), "a 1-token doc has no bigrams and no row")
    val fluentNll = got(0L)._2
    val weirdNll = got(10L)._2
    assert(weirdNll > fluentNll, s"weird $weirdNll !> fluent $fluentNll")
  }
}
