package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Retrieval-style document scoring over the `documents` table: TF-IDF
  * term ranking, BM25 query scoring, character-level Shannon entropy, and
  * a corpus-trained character-bigram language-model quality score (the
  * perplexity-proxy filter of a training-data pipeline).
  *
  * Scale design: every query is one tokenize/explode scan plus hash
  * aggregations that combine map-side. The model tables these queries
  * train (document frequencies over a vocabulary, a char-bigram LM over
  * <= |alphabet|^2 rows, corpus length stats) are tiny and broadcast back
  * to the corpus-sized side — at 100 TB the corpus is never shuffled, only
  * its aggregates are.
  *
  * Determinism across engines: the only non-exact primitive is `ln`,
  * which may differ between Spark (Java) and DuckDB (C++) in the last
  * ulp. Every `ln` is therefore quantized to integer micro-nats AT ITS
  * SMALLEST CARDINALITY POINT — per vocabulary word (idf), per distinct
  * count value (entropy), per bigram (LM) — where a last-ulp difference
  * only matters if ln(x)*1e6 lands within ~1e-9 of a rounding boundary
  * across a few hundred distinct values. All downstream arithmetic on the
  * quantized values is integer (exact), or a single correctly-rounded
  * IEEE division of exact integers (bit-identical in both engines).
  */
object RetrievalQueries extends QueryPack {
  import TextQueries.{h64, duckH64}

  private def docs(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql(sql)
  }

  // Whitespace tokenization, shared by tf-idf and BM25.
  private val sparkTok =
    """tok AS (
      |  SELECT doc_id, word
      |  FROM documents LATERAL VIEW explode(split(text, '\\s+')) t AS word
      |  WHERE word != '')""".stripMargin

  private val duckTok =
    """tok AS (
      |  SELECT doc_id, word FROM (
      |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word FROM documents)
      |  WHERE word != '')""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Contrastive topic keywords (c-TF-IDF): the top-5 terms that most
    // DISTINGUISH each source group — "what is in my corpus, per slice",
    // the first question asked of a new training mix. Group-level tf is
    // one map-combinable aggregate over the tokenize scan (corpus rows
    // shuffle once, on (source, word)); the group-frequency table gf and
    // the group count are vocabulary-sized and broadcast back; scores are
    // exact integer products of tf with a per-word micro-nat idf, so
    // ranking ties break identically in both engines.
    "x_topic_keywords" -> ((s, dir) => docs(s, dir,
      """WITH tok AS (
        |  SELECT source, word
        |  FROM documents LATERAL VIEW explode(split(text, '\\s+')) t AS word
        |  WHERE word != ''),
        |tf AS (SELECT source, word, count(*) AS tf FROM tok GROUP BY source, word),
        |gf AS (SELECT word, count(*) AS gf FROM tf GROUP BY word),
        |ns AS (SELECT count(DISTINCT source) AS n FROM documents),
        |idf AS (SELECT word, gf,
        |  CAST(floor(ln(1.0D + CAST(n AS DOUBLE) / gf) * 1000000 + 0.5) AS BIGINT) AS idf_micro
        |  FROM gf CROSS JOIN ns),
        |scored AS (
        |  SELECT tf.source, tf.word, tf.tf, i.gf, tf.tf * i.idf_micro AS score_micro
        |  FROM tf JOIN idf i ON i.word = tf.word)
        |SELECT source, word, CAST(tf AS BIGINT) AS tf, CAST(gf AS BIGINT) AS n_groups_with_word,
        |  score_micro, rank
        |FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY score_micro DESC, word) AS BIGINT) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin)),

    // TF-IDF: top-3 terms per document. df is one tiny vocabulary-sized
    // aggregate joined back (broadcast at scale); idf quantized to
    // micro-nats per word, scores are exact integer products.
    "x_tfidf" -> ((s, dir) => docs(s, dir,
      s"""WITH $sparkTok,
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
         |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY word),
         |nd AS (SELECT count(*) AS n FROM documents),
         |idf AS (SELECT word, df,
         |  CAST(floor(ln((n + 1.0) / (df + 1.0)) * 1000000 + 0.5) AS BIGINT) AS idf_micro
         |  FROM df CROSS JOIN nd),
         |scored AS (
         |  SELECT tf.doc_id, tf.word, tf.tf, i.df, tf.tf * i.idf_micro AS score_micro
         |  FROM tf JOIN idf i ON i.word = tf.word)
         |SELECT doc_id, word, tf, df, score_micro, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score_micro DESC, word) AS BIGINT) AS rank
         |  FROM scored) WHERE rank <= 3""".stripMargin)),

    // BM25 (k1=1.2, b=0.75) of the fixed query {spark, merge, window}:
    // top-20 documents. Each per-(doc, term) score is one correctly-
    // rounded double expression over exact integers (identical in both
    // engines), quantized to an integer BEFORE the per-doc sum — so the
    // sum is exact integer addition, independent of aggregation order.
    "x_bm25" -> ((s, dir) => docs(s, dir,
      s"""WITH $sparkTok,
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |st AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, count(*) AS nd FROM dl),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok
         |  WHERE word IN ('spark', 'merge', 'window') GROUP BY doc_id, word),
         |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word),
         |idf AS (SELECT word,
         |  CAST(floor(ln(1.0 + (s.nd - df + 0.5) / (df + 0.5)) * 1000000 + 0.5) AS BIGINT) AS idf_micro
         |  FROM df CROSS JOIN st s),
         |parts AS (
         |  SELECT tf.doc_id,
         |    CAST(floor(CAST(i.idf_micro AS DOUBLE) * (tf.tf * 2.2)
         |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) + 0.5) AS BIGINT) AS part_micro
         |  FROM tf JOIN idf i ON i.word = tf.word
         |          JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st s),
         |sc AS (SELECT doc_id, CAST(sum(part_micro) AS BIGINT) AS score_micro
         |  FROM parts GROUP BY doc_id),
         |top AS (SELECT doc_id, score_micro FROM sc ORDER BY score_micro DESC, doc_id LIMIT 20)
         |SELECT doc_id, score_micro,
         |  CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
         |FROM top""".stripMargin)),

    // Character-level Shannon entropy per document (micro-nats):
    // H = ln(n) - sum(c*ln c)/n over exact integer counts, with ln
    // quantized per distinct count value.
    "x_char_entropy" -> ((s, dir) => docs(s, dir,
      """WITH pos AS (
        |  SELECT doc_id, substring(text, i, 1) AS ch
        |  FROM documents LATERAL VIEW explode(sequence(1, length(text))) t AS i),
        |cc AS (SELECT doc_id, ch, count(*) AS c FROM pos GROUP BY doc_id, ch),
        |lnc AS (SELECT doc_id, c,
        |  CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lnc_micro FROM cc),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(sum(c * lnc_micro) AS BIGINT) AS s, count(*) AS n_distinct
        |  FROM lnc GROUP BY doc_id)
        |SELECT doc_id, n AS n_chars, CAST(n_distinct AS BIGINT) AS n_distinct_chars,
        |  CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |    - CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS entropy_micro
        |FROM agg""".stripMargin)),

    // Word co-occurrence PMI: top-20 word pairs by pointwise mutual
    // information over document co-occurrence (min support 5). The pair
    // space is bounded by |vocabulary|^2 regardless of corpus size —
    // the per-doc self-join feeds one map-side-combinable count.
    "x_cooccurrence_pmi" -> ((s, dir) => {
      // the distinct (doc, word) set feeds the self-join twice plus the
      // word-count side — materialize it once (r14: as a plain CTE,
      // Catalyst inlined it into 4 corpus re-scans)
      Tables(s, dir, "documents").createOrReplaceTempView("documents")
      Tables.cacheView("pmi_dw", s.sql(
        s"WITH $sparkTok SELECT DISTINCT doc_id, word FROM tok"))
      s.sql(
      s"""WITH dw AS (SELECT doc_id, word FROM pmi_dw),
         |nd AS (SELECT count(*) AS n FROM documents),
         |wc AS (SELECT word, count(*) AS c FROM dw GROUP BY word),
         |pairs AS (
         |  SELECT a.word AS w1, b.word AS w2, count(*) AS c12
         |  FROM dw a JOIN dw b ON b.doc_id = a.doc_id AND a.word < b.word
         |  GROUP BY a.word, b.word),
         |pmi AS (
         |  SELECT p.w1, p.w2, p.c12,
         |    CAST(floor(ln((CAST(p.c12 AS DOUBLE) * n) / (CAST(ca.c AS DOUBLE) * cb.c)) * 1000000 + 0.5) AS BIGINT) AS pmi_micro
         |  FROM pairs p JOIN wc ca ON ca.word = p.w1 JOIN wc cb ON cb.word = p.w2 CROSS JOIN nd
         |  WHERE p.c12 >= 5),
         |top AS (SELECT w1, w2, c12, pmi_micro FROM pmi ORDER BY pmi_micro DESC, w1, w2 LIMIT 20)
         |SELECT w1, w2, c12, pmi_micro,
         |  CAST(row_number() OVER (ORDER BY pmi_micro DESC, w1, w2) AS BIGINT) AS rank
         |FROM top""".stripMargin)
    }),

    // Corpus-trained character-bigram LM quality score: per-doc average
    // negative log-probability (micro-nats) under P(c2|c1) =
    // count(c1c2)/count(c1 .), plus a keep verdict. The LM table is
    // <= |alphabet|^2 rows — a broadcast model at any corpus size.
    "x_bigram_lm" -> ((s, dir) => {
      // The per-doc bigram COUNT table is the only corpus-sized
      // intermediate; cache it once — the LM training side and the
      // scoring side both read it, and as a plain CTE Spark would re-run
      // the explode per reference. Counts aggregate the positions, so
      // sum(c) / sum(c * lp) reproduce the per-position totals exactly.
      Tables(s, dir, "documents").createOrReplaceTempView("documents")
      Tables.cacheView("bigram_counts", s.sql(
        """SELECT doc_id, bg, count(*) AS c FROM (
          |  SELECT doc_id, substring(text, i, 2) AS bg
          |  FROM documents LATERAL VIEW explode(sequence(1, length(text) - 1)) t AS i)
          |GROUP BY doc_id, bg""".stripMargin))
      s.sql(
        """WITH cnt2 AS (SELECT bg, CAST(sum(c) AS BIGINT) AS c2 FROM bigram_counts GROUP BY bg),
          |cnt1 AS (SELECT substring(bg, 1, 1) AS c1, CAST(sum(c2) AS BIGINT) AS c1n
          |  FROM cnt2 GROUP BY substring(bg, 1, 1)),
          |lm AS (
          |  SELECT t2.bg,
          |    CAST(floor(ln(CAST(t2.c2 AS DOUBLE) / t1.c1n) * 1000000 + 0.5) AS BIGINT) AS lp_micro
          |  FROM cnt2 t2 JOIN cnt1 t1 ON t1.c1 = substring(t2.bg, 1, 1)),
          |perdoc AS (
          |  SELECT bc.doc_id, CAST(sum(bc.c) AS BIGINT) AS n_bigrams,
          |    CAST(sum(bc.c * lm.lp_micro) AS BIGINT) AS slp
          |  FROM bigram_counts bc JOIN lm ON lm.bg = bc.bg
          |  GROUP BY bc.doc_id)
          |SELECT doc_id, n_bigrams,
          |  CAST(floor(CAST(0 - slp AS DOUBLE) / n_bigrams + 0.5) AS BIGINT) AS nll_micro,
          |  CAST(floor(CAST(0 - slp AS DOUBLE) / n_bigrams + 0.5) AS BIGINT) <= 3500000 AS keep
          |FROM perdoc""".stripMargin)
    }),

    // Count-min sketch heavy hitters: frequencies folded into a fixed
    // 2x1024-cell sketch (two salted 60-bit hash rows), estimate =
    // min over rows — the bounded-memory frequency structure for
    // streams/shards whose exact key space doesn't fit. Emitted for the
    // exact top-20: exact count, sketch estimate, the CMS soundness
    // invariant (estimate never undercounts), and the overestimate in
    // parts-per-million of corpus mass. Everything is exact integer
    // arithmetic on fixed hashes — both engines compute identical cells.
    // At 100 TB the sketch is 2 KB per shard and merges by cell-wise sum;
    // here the cells build from the same combine-friendly word counts the
    // exact path uses, so one query audits the sketch against truth.
    "x_heavy_hitters" -> ((s, dir) => docs(s, dir,
      s"""WITH $sparkTok,
         |cnt AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY word),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
         |r1 AS (SELECT pos, CAST(sum(c) AS BIGINT) AS v FROM (
         |  SELECT ${h64("concat('cms1_', word)")} % 1024 AS pos, c FROM cnt) GROUP BY pos),
         |r2 AS (SELECT pos, CAST(sum(c) AS BIGINT) AS v FROM (
         |  SELECT ${h64("concat('cms2_', word)")} % 1024 AS pos, c FROM cnt) GROUP BY pos),
         |top AS (SELECT word, c FROM cnt ORDER BY c DESC, word LIMIT 20)
         |SELECT t.word, t.c AS exact_count,
         |  least(a.v, b.v) AS cms_estimate,
         |  least(a.v, b.v) >= t.c AS sound,
         |  CAST((least(a.v, b.v) - t.c) * 1000000 DIV tot.n AS BIGINT) AS overestimate_ppm
         |FROM top t CROSS JOIN tot
         |JOIN r1 a ON a.pos = ${h64("concat('cms1_', t.word)")} % 1024
         |JOIN r2 b ON b.pos = ${h64("concat('cms2_', t.word)")} % 1024""".stripMargin)),

    // Inverted-index construction: term → (df, collection tf, top-10
    // posting list ordered by tf desc). The posting string is REBUILT in
    // rank order and hash-compared cross-engine — proving the index
    // content, not just its counts. Scale shape: per-(term, doc) tf is a
    // combine-friendly groupBy; the rank window per term is top-k-per-key
    // over the tf table (never the corpus); output rows are bounded by
    // vocabulary and each posting list is capped at 10 entries, so the
    // index itself broadcasts back to query time.
    // NOTE df/ctf ride the SAME term-partitioned window pass as the
    // rank (one WindowExec) instead of a separate aggregate CTE joined
    // back — that formulation re-executes the tokenize+tf subtree twice.
    "x_inverted_index" -> ((s, dir) => docs(s, dir,
      """WITH tok AS (
        |  SELECT doc_id, term
        |  FROM documents LATERAL VIEW explode(split(lower(text), '[^a-z0-9]+')) t AS term),
        |tf AS (
        |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok WHERE length(term) >= 4 GROUP BY term, doc_id),
        |top AS (
        |  SELECT term, doc_id, tf,
        |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn,
        |    CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
        |    CAST(SUM(tf) OVER (PARTITION BY term) AS BIGINT) AS ctf
        |  FROM tf),
        |post AS (
        |  SELECT term, max(df) AS df, max(ctf) AS ctf,
        |    array_join(transform(array_sort(collect_list(named_struct(
        |      'rn', rn, 'e', concat(CAST(doc_id AS STRING), ':', CAST(tf AS STRING))))),
        |      x -> x.e), ',') AS postings
        |  FROM top WHERE rn <= 10 GROUP BY term)
        |SELECT term, df, ctf, postings
        |FROM post WHERE df >= 50""".stripMargin)),

    // DSIR-style importance weights (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): per-doc
    // log-likelihood ratio between a TARGET-domain hashed-unigram LM
    // (lang = 'en' here) and the SOURCE LM of everything else, add-one
    // smoothed over 4096 hash buckets. The two LMs are ONE
    // map-combinable groupBy over the tokenize scan (a conditional sum
    // per side — the corpus is scanned once, not once per LM); the
    // 4096-row log-ratio table is quantized to micro-nats per BUCKET
    // (smallest-cardinality point, the x_tfidf discipline) and
    // broadcast back onto per-doc feature counts, so the weight sum is
    // exact integer arithmetic. Docs scoring highest are the ones
    // importance resampling keeps when targeting the 'en' slice.
    "x_importance_weights" -> ((s, dir) => docs(s, dir,
      s"""WITH tok AS (
         |  SELECT doc_id, lang, word
         |  FROM documents LATERAL VIEW explode(split(text, '\\\\s+')) t AS word
         |  WHERE word != ''),
         |f AS (SELECT doc_id, lang, ${h64("word")} % 4096 AS f FROM tok),
         |cnt AS (SELECT f,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tf,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS sf
         |       FROM f GROUP BY f),
         |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS tt, CAST(sum(sf) AS BIGINT) AS st FROM cnt),
         |lr AS (SELECT f, CAST(floor(ln((CAST(tf + 1 AS DOUBLE) * (st + 4096)) / (CAST(sf + 1 AS DOUBLE) * (tt + 4096))) * 1000000 + 0.5) AS BIGINT) AS lr_micro
         |       FROM cnt CROSS JOIN tot),
         |d AS (SELECT doc_id, f, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY doc_id, f)
         |SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_tokens,
         |  CAST(sum(d.c * lr.lr_micro) AS BIGINT) AS llr_micro,
         |  CAST(sum(d.c * lr.lr_micro) DIV sum(d.c) AS BIGINT) AS per_token_micro
         |FROM d JOIN lr ON lr.f = d.f
         |GROUP BY d.doc_id""".stripMargin))
  )

  def oracle: Map[String, String] = Map(
    "x_importance_weights" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang, word FROM (
         |    SELECT doc_id, lang, unnest(string_split_regex(text, '\\s+')) AS word FROM documents)
         |  WHERE word != ''),
         |f AS (SELECT doc_id, lang, ${duckH64("word")} % 4096 AS f FROM tok),
         |cnt AS (SELECT f,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tf,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS sf
         |       FROM f GROUP BY f),
         |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS tt, CAST(sum(sf) AS BIGINT) AS st FROM cnt),
         |lr AS (SELECT f, CAST(floor(ln((CAST(tf + 1 AS DOUBLE) * (st + 4096)) / (CAST(sf + 1 AS DOUBLE) * (tt + 4096))) * 1000000 + 0.5) AS BIGINT) AS lr_micro
         |       FROM cnt CROSS JOIN tot),
         |d AS (SELECT doc_id, f, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY doc_id, f)
         |SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_tokens,
         |  CAST(sum(d.c * lr.lr_micro) AS BIGINT) AS llr_micro,
         |  CAST(sum(d.c * lr.lr_micro) // sum(d.c) AS BIGINT) AS per_token_micro
         |FROM d JOIN lr ON lr.f = d.f
         |GROUP BY d.doc_id""".stripMargin,
    "x_topic_keywords" ->
      """WITH tok AS (
        |  SELECT source, word FROM (
        |    SELECT source, unnest(string_split_regex(text, '\s+')) AS word FROM documents)
        |  WHERE word != ''),
        |tf AS (SELECT source, word, count(*) AS tf FROM tok GROUP BY source, word),
        |gf AS (SELECT word, count(*) AS gf FROM tf GROUP BY word),
        |ns AS (SELECT count(DISTINCT source) AS n FROM documents),
        |idf AS (SELECT word, gf,
        |  CAST(floor(ln(1.0 + CAST(n AS DOUBLE) / gf) * 1000000 + 0.5) AS BIGINT) AS idf_micro
        |  FROM gf CROSS JOIN ns),
        |scored AS (
        |  SELECT tf.source, tf.word, tf.tf, idf.gf, tf.tf * idf.idf_micro AS score_micro
        |  FROM tf JOIN idf ON idf.word = tf.word)
        |SELECT source, word, CAST(tf AS BIGINT) AS tf, CAST(gf AS BIGINT) AS n_groups_with_word,
        |  score_micro, rank
        |FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY score_micro DESC, word) AS BIGINT) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    "x_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok WHERE length(term) >= 4 GROUP BY term, doc_id),
        |agg AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS ctf
        |  FROM tf GROUP BY term),
        |top AS (
        |  SELECT term, doc_id, tf,
        |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
        |  FROM tf),
        |post AS (
        |  SELECT term, string_agg(doc_id::VARCHAR || ':' || tf::VARCHAR, ',' ORDER BY rn) AS postings
        |  FROM top WHERE rn <= 10 GROUP BY term)
        |SELECT agg.term AS term, agg.df AS df, agg.ctf AS ctf, post.postings AS postings
        |FROM agg JOIN post ON post.term = agg.term
        |WHERE agg.df >= 50""".stripMargin,
    "x_tfidf" ->
      s"""WITH $duckTok,
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
         |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY word),
         |nd AS (SELECT count(*) AS n FROM documents),
         |idf AS (SELECT word, df,
         |  CAST(floor(ln((n + 1.0) / (df + 1.0)) * 1000000 + 0.5) AS BIGINT) AS idf_micro
         |  FROM df CROSS JOIN nd),
         |scored AS (
         |  SELECT tf.doc_id, tf.word, tf.tf, i.df, tf.tf * i.idf_micro AS score_micro
         |  FROM tf JOIN idf i ON i.word = tf.word)
         |SELECT doc_id, word, tf, df, score_micro, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score_micro DESC, word) AS rank
         |  FROM scored) WHERE rank <= 3""".stripMargin,

    "x_bm25" ->
      s"""WITH $duckTok,
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |st AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, count(*) AS nd FROM dl),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok
         |  WHERE word IN ('spark', 'merge', 'window') GROUP BY doc_id, word),
         |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word),
         |idf AS (SELECT word,
         |  CAST(floor(ln(1.0 + (s.nd - df + 0.5) / (df + 0.5)) * 1000000 + 0.5) AS BIGINT) AS idf_micro
         |  FROM df CROSS JOIN st s),
         |parts AS (
         |  SELECT tf.doc_id,
         |    CAST(floor(CAST(i.idf_micro AS DOUBLE) * (tf.tf * 2.2)
         |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) + 0.5) AS BIGINT) AS part_micro
         |  FROM tf JOIN idf i ON i.word = tf.word
         |          JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st s),
         |sc AS (SELECT doc_id, CAST(sum(part_micro) AS BIGINT) AS score_micro
         |  FROM parts GROUP BY doc_id),
         |top AS (SELECT doc_id, score_micro FROM sc ORDER BY score_micro DESC, doc_id LIMIT 20)
         |SELECT doc_id, score_micro,
         |  row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rank
         |FROM top""".stripMargin,

    "x_char_entropy" ->
      """WITH pos AS (
        |  SELECT doc_id, substring(text, i, 1) AS ch FROM (
        |    SELECT doc_id, text, unnest(generate_series(1, len(text))) AS i FROM documents)),
        |cc AS (SELECT doc_id, ch, count(*) AS c FROM pos GROUP BY doc_id, ch),
        |lnc AS (SELECT doc_id, c,
        |  CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lnc_micro FROM cc),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(sum(c * lnc_micro) AS BIGINT) AS s, count(*) AS n_distinct
        |  FROM lnc GROUP BY doc_id)
        |SELECT doc_id, n AS n_chars, CAST(n_distinct AS BIGINT) AS n_distinct_chars,
        |  CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |    - CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS entropy_micro
        |FROM agg""".stripMargin,

    "x_cooccurrence_pmi" ->
      s"""WITH $duckTok,
         |dw AS (SELECT DISTINCT doc_id, word FROM tok),
         |nd AS (SELECT count(*) AS n FROM documents),
         |wc AS (SELECT word, count(*) AS c FROM dw GROUP BY word),
         |pairs AS (
         |  SELECT a.word AS w1, b.word AS w2, count(*) AS c12
         |  FROM dw a JOIN dw b ON b.doc_id = a.doc_id AND a.word < b.word
         |  GROUP BY a.word, b.word),
         |pmi AS (
         |  SELECT p.w1, p.w2, p.c12,
         |    CAST(floor(ln((CAST(p.c12 AS DOUBLE) * n) / (CAST(ca.c AS DOUBLE) * cb.c)) * 1000000 + 0.5) AS BIGINT) AS pmi_micro
         |  FROM pairs p JOIN wc ca ON ca.word = p.w1 JOIN wc cb ON cb.word = p.w2 CROSS JOIN nd
         |  WHERE p.c12 >= 5),
         |top AS (SELECT w1, w2, c12, pmi_micro FROM pmi ORDER BY pmi_micro DESC, w1, w2 LIMIT 20)
         |SELECT w1, w2, c12, pmi_micro,
         |  row_number() OVER (ORDER BY pmi_micro DESC, w1, w2) AS rank
         |FROM top""".stripMargin,

    "x_bigram_lm" ->
      """WITH b AS (
        |  SELECT doc_id, substring(text, i, 2) AS bg, substring(text, i, 1) AS c1 FROM (
        |    SELECT doc_id, text, unnest(generate_series(1, len(text) - 1)) AS i FROM documents)),
        |cnt2 AS (SELECT bg, count(*) AS c2 FROM b GROUP BY bg),
        |cnt1 AS (SELECT c1, count(*) AS c1n FROM b GROUP BY c1),
        |lm AS (
        |  SELECT t2.bg,
        |    CAST(floor(ln(CAST(t2.c2 AS DOUBLE) / t1.c1n) * 1000000 + 0.5) AS BIGINT) AS lp_micro
        |  FROM cnt2 t2 JOIN cnt1 t1 ON t1.c1 = substring(t2.bg, 1, 1)),
        |perdoc AS (
        |  SELECT b.doc_id, count(*) AS n_bigrams, CAST(sum(lm.lp_micro) AS BIGINT) AS slp
        |  FROM b JOIN lm ON lm.bg = b.bg
        |  GROUP BY b.doc_id)
        |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        |  CAST(floor(CAST(0 - slp AS DOUBLE) / n_bigrams + 0.5) AS BIGINT) AS nll_micro,
        |  CAST(floor(CAST(0 - slp AS DOUBLE) / n_bigrams + 0.5) AS BIGINT) <= 3500000 AS keep
        |FROM perdoc""".stripMargin,

    "x_heavy_hitters" ->
      s"""WITH $duckTok,
         |cnt AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY word),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
         |r1 AS (SELECT pos, CAST(sum(c) AS BIGINT) AS v FROM (
         |  SELECT ${duckH64("'cms1_' || word")} % 1024 AS pos, c FROM cnt) GROUP BY pos),
         |r2 AS (SELECT pos, CAST(sum(c) AS BIGINT) AS v FROM (
         |  SELECT ${duckH64("'cms2_' || word")} % 1024 AS pos, c FROM cnt) GROUP BY pos),
         |top AS (SELECT word, c FROM cnt ORDER BY c DESC, word LIMIT 20)
         |SELECT t.word, t.c AS exact_count,
         |  least(a.v, b.v) AS cms_estimate,
         |  least(a.v, b.v) >= t.c AS sound,
         |  CAST((least(a.v, b.v) - t.c) * 1000000 // tot.n AS BIGINT) AS overestimate_ppm
         |FROM top t CROSS JOIN tot
         |JOIN r1 a ON a.pos = ${duckH64("'cms1_' || t.word")} % 1024
         |JOIN r2 b ON b.pos = ${duckH64("'cms2_' || t.word")} % 1024""".stripMargin
  )
}
