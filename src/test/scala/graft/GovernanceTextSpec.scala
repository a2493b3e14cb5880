package graft

/** Specs for the r13 text/governance additions: BPE tokenizer
  * APPLICATION (`x_bpe_encode`), contrastive topic keywords
  * (`x_topic_keywords`), and the k-anonymity / l-diversity audit
  * (`x_k_anonymity`). Each is hash-gated against DuckDB by the oracle
  * board; these tests pin the SEMANTICS on hand-checkable inputs and the
  * plan shapes the oracle cannot see.
  */
class GovernanceTextSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bpe encode reproduces greedy merge application on hand words") {
    // merge table: th, the, ab, le, able, table, in, ine, line, ow, row,
    // da, ta, data — 'table'/'line'/'data'/'the' collapse to one token,
    // 'window' segments as (w)(in)(d)(ow)
    Seq((1L, "table line data the window spark"))
      .toDF("doc_id", "text").createOrReplaceTempView("documents_raw")
    // route through the real query by staging a one-row documents table
    val tmp = tmpDir("bpeenc")
    spark.sql("SELECT doc_id, text FROM documents_raw")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val row = SparkEntry.queries("x_bpe_encode")(spark, tmp).collect().head
    assert(row.getAs[Long]("n_words") == 6L)
    // table=1, line=1, data=1, the=1, window=4 (w|in|d|ow), spark=5
    assert(row.getAs[Long]("n_tokens") == 13L)
    assert(row.getAs[Long]("fertility_micro") == 13000000L / 6L)
  }

  test("bpe encode plans as a pure map: no exchange anywhere") {
    val p = SparkEntry.queries("x_bpe_encode")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"tokenizer application must be shuffle-free:\n$p")
  }

  test("topic keywords: distinctive terms outrank ubiquitous ones") {
    val rows = SparkEntry.queries("x_topic_keywords")(spark, dir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    // exactly 5 ranked keywords per source, ranks 1..5
    bySource.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    }
    // a term present in every group carries idf ln(1 + n/n) = ln 2 —
    // never more per-occurrence weight than a term in fewer groups
    val nGroups = bySource.size.toLong
    rows.foreach { r =>
      val perOcc = r.getAs[Long]("score_micro") / r.getAs[Long]("tf")
      if (r.getAs[Long]("n_groups_with_word") == nGroups)
        assert(perOcc == math.floor(math.log(2.0) * 1e6 + 0.5).toLong)
      else assert(perOcc > math.floor(math.log(2.0) * 1e6 + 0.5).toLong)
    }
  }

  test("k-anonymity audit flags exactly the groups smaller than k") {
    val rows = SparkEntry.queries("x_k_anonymity")(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("k_anonymous") == (r.getAs[Long]("group_size") >= 10L))
      assert(r.getAs[Boolean]("l_diverse") == (r.getAs[Long]("l_diversity") >= 3L))
      assert(r.getAs[Long]("l_diversity") <= r.getAs[Long]("group_size"))
    }
    // the audit is an aggregate: output bounded by the QI domain
    assert(rows.length <= 5 * 7) // |langs| x |length buckets <= 700 chars|
  }
}
