package graft

/** Closed-form checks for the TextQueries SQL constants on hand-built
  * corpora: an exact power-law corpus recovers the Zipf exponent.
  */
class TextQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def asDocs(texts: Seq[String]): Unit =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").createOrReplaceTempView("documents")

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
}
