package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language-ID heuristic, position-salted document
  * fingerprinting, exact content dedup, and the multimodal binary-column
  * plumbing. All are single-pass, map-side-combinable aggregations — at
  * 100 TB each is one scan plus (at most) one hash-partition shuffle on
  * doc_id/content-hash.
  *
  * Cross-engine hash primitive shared with the DuckDB oracles: the top 60
  * bits of md5 interpreted as a BIGINT —
  *   Spark:  CAST(conv(substring(md5(x),1,15),16,10) AS BIGINT)
  *   DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT
  * (verified identical; md5 is bit-stable everywhere).
  */
object TextQueries extends QueryPack {

  private def run(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql(sql)
  }

  /** Spark-side 60-bit md5 hash of an expression. */
  def h64(x: String): String =
    s"CAST(conv(substring(md5($x),1,15),16,10) AS BIGINT)"

  /** DuckDB twin of [[h64]]. */
  def duckH64(x: String): String =
    s"('0x' || substr(md5($x),1,15))::BIGINT"

  /** Fixed rank-ordered merge table for `x_bpe_encode` — the "apply a
    * trained tokenizer at scale" half of the BPE story (`x_bpe_train`
    * learns merges; this APPLIES a given table corpus-wide). The merges
    * are literals so the DuckDB oracle can apply the identical table:
    * both engines fold them over a `(c)(h)(a)(r)`-wrapped word in rank
    * order, and a single left-to-right non-overlapping `replace` pass per
    * merge is exactly greedy BPE application (symbols never contain
    * parentheses, so the textual pattern `(a)(b)` matches precisely the
    * adjacent symbol pairs, and a replacement can never complete a new
    * occurrence of its own pattern).
    */
  private val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "a" -> "b", "l" -> "e", "ab" -> "le",
    "t" -> "able", "i" -> "n", "in" -> "e", "l" -> "ine", "o" -> "w",
    "r" -> "ow", "d" -> "a", "t" -> "a", "da" -> "ta")

  /** Nested `replace` chain applying [[bpeMerges]] in rank order to a
    * wrapped-symbol string expression (same surface syntax in both
    * engines).
    */
  private def bpeChain(seed: String): String =
    bpeMerges.foldLeft(seed) { case (acc, (a, b)) =>
      s"replace($acc, '($a)($b)', '($a$b)')"
    }

  /** Zipf log-log OLS text (shared with TextQueriesSpec — see the
    * x_zipf_fit query comment for the design).
    */
  private[graft] val zipfSql: String =
    """WITH f AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq
      |  FROM documents LATERAL VIEW explode(split(lower(text), '\\s+')) t AS word
      |  WHERE length(word) >= 2 GROUP BY word),
      |r AS (
      |  SELECT freq, row_number() OVER (ORDER BY freq DESC, word) AS rnk
      |  FROM f),
      |q AS (
      |  SELECT CAST(FLOOR(ln(CAST(rnk AS DOUBLE)) * 1000) AS BIGINT) AS x,
      |    CAST(FLOOR(ln(CAST(freq AS DOUBLE)) * 1000) AS BIGINT) AS y
      |  FROM r WHERE rnk <= 500),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM q)
      |SELECT n AS n_terms,
      |  CAST((n * sxy - sx * sy) * 1000 DIV (n * sxx - sx * sx) AS BIGINT) AS zipf_slope_milli,
      |  CAST((sy - ((n * sxy - sx * sy) * 1000 DIV (n * sxx - sx * sx)) * sx DIV 1000)
      |    DIV n AS BIGINT) AS intercept_milli_ln
      |FROM m""".stripMargin

  /** Perplexity filtering (the CCNet-shape quality gate): an add-one-
    * smoothed bigram LM trained ON the corpus scores every document's
    * average negative log-likelihood — the classic "weird text scores
    * high" filter a downstream threshold consumes. Shapes:
    *   - ONE corpus tokenization pass materializes the positional
    *     bigram table (cached view — three consumers, zero re-scans);
    *   - the MODEL (bigram counts) is corpus-bigram-bounded, its
    *     unigram/vocab reductions are model-table-sized aggregates, and
    *     the scoring pass is two equi-joins against it — broadcast-able
    *     at any corpus size where the model fits, shuffle-join beyond;
    *   - determinism: counts are exact int64; the per-bigram
    *     −ln P = ln((c1 + V)/(c12 + 1)) is a single ln of one exact
    *     integer ratio, FLOOR-quantized to micro-nats PER TERM before
    *     any sum (the x_benford idiom), and (c1 ≥ c12, V ≥ 1) makes
    *     every term non-negative by construction.
    */
  private val pplBigramsSql =
    s"""WITH w AS (SELECT doc_id,
       |    ${UnicodeQueries.uniWords("spark", "lower(text)")} AS ws
       |  FROM documents_uni)
       |SELECT doc_id, element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2
       |FROM w LATERAL VIEW explode(sequence(1, size(ws) - 1)) t AS i
       |WHERE size(ws) >= 2""".stripMargin

  private val pplModelSql =
    "SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM ppl_bg GROUP BY w1, w2"

  private val pplScoreSql =
    """WITH c1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cu FROM ppl_c12 GROUP BY w1),
      |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS vocab FROM ppl_c12),
      |t AS (SELECT b.doc_id,
      |    CAST(FLOOR(ln(CAST(c1.cu + v.vocab AS DOUBLE) / CAST(m.c + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS nll_micro
      |  FROM ppl_bg b
      |  JOIN ppl_c12 m ON m.w1 = b.w1 AND m.w2 = b.w2
      |  JOIN c1 ON c1.w1 = b.w1 CROSS JOIN v)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(nll_micro) AS BIGINT) DIV CAST(count(*) AS BIGINT) AS nll_avg_micro
      |FROM t GROUP BY doc_id""".stripMargin

  /** Spec hook: run the three perplexity stages over whatever table is
    * registered as `documents` in `s` (the board query binds the sfDir
    * table; `TextQueriesSpec` binds hand-built frames).
    */
  private[graft] def perplexityOver(s: SparkSession): DataFrame = {
    Tables.cacheView("ppl_bg", s.sql(pplBigramsSql))
    Tables.cacheView("ppl_c12", s.sql(pplModelSql))
    s.sql(pplScoreSql)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_perplexity_lm" -> ((s, dir) => {
      UnicodeQueries.bindUni(s, dir)
      perplexityOver(s)
    }),

    // Token counting: whitespace tokens + unicode-aware BPE-ish
    // segmentation (UnicodeQueries.uniTokens — \p{L}\p{M}\p{N} classes
    // with CJK pre-spacing), over the multi-script corpus.
    "x_token_count" -> ((s, dir) => {
      UnicodeQueries.bindUni(s, dir)
      s.sql(
        s"""SELECT doc_id,
           |  CAST(size(split(text, '\\\\s+')) AS BIGINT) AS ws_tokens,
           |  CAST(size(${UnicodeQueries.uniTokens("spark", "text")}) AS BIGINT) AS bpe_ish_tokens,
           |  CAST(length(text) AS BIGINT) AS n_chars_actual
           |FROM documents_uni""".stripMargin)
    }),

    // Quality scoring: word stats, stopword/unique ratios, composite score.
    "x_quality_score" -> ((s, dir) => run(s, dir,
      """WITH w AS (SELECT doc_id, length(text) AS n_chars, split(text, '\\s+') AS words FROM documents)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(size(words) AS BIGINT) AS n_words,
        |  CAST(size(array_distinct(words)) AS DOUBLE) / size(words) AS unique_ratio,
        |  CAST(size(filter(words, x -> x IN ('the','a','of','and'))) AS DOUBLE) / size(words) AS stopword_ratio,
        |  CAST(n_chars AS DOUBLE) / size(words) AS avg_word_len,
        |  0.5 * (CAST(size(array_distinct(words)) AS DOUBLE) / size(words))
        |    + 0.3 * (1.0 - CAST(size(filter(words, x -> x IN ('the','a','of','and'))) AS DOUBLE) / size(words))
        |    + 0.2 * least(CAST(size(words) AS DOUBLE) / 50.0, 1.0) AS quality_score
        |FROM w""".stripMargin)),

    // Language-ID moved to UnicodeQueries (x_lang_id): script-range
    // voting + character-trigram profiles over the multi-script corpus.

    // Position-salted rolling fingerprint: order-sensitive content hash,
    // map-side combinable (sum of per-token hashes mod a prime).
    "x_fingerprint" -> ((s, dir) => run(s, dir,
      s"""WITH t AS (
         |  SELECT doc_id, pos, word
         |  FROM documents LATERAL VIEW posexplode(split(text, '\\\\s+')) x AS pos, word)
         |SELECT doc_id,
         |  sum(${h64("concat(pos + 1, ':', word)")} % 1000000007) AS fingerprint,
         |  count(*) AS n_tokens
         |FROM t GROUP BY doc_id""".stripMargin)),

    // Exact dedup: one representative (min doc_id) per distinct content.
    "x_dedup_exact" -> ((s, dir) => run(s, dir,
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin)),

    // Output sharding: deterministic hash-assignment of documents to N
    // training shards with per-shard stats — the write-side partitioner
    // of a data pipeline (at scale this IS the repartition key, so each
    // shard is one output task/file group).
    "x_shard_assignment" -> ((s, dir) => run(s, dir,
      s"""WITH assigned AS (
         |  SELECT doc_id, n_chars, pmod(${h64("text")}, 16) AS shard
         |  FROM documents)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  min(doc_id) AS first_doc
         |FROM assigned GROUP BY shard""".stripMargin)),

    // Sequence packing for pretraining, GPT-style concat-and-chop: per
    // shard, documents concatenate into one token stream (cumulative sum
    // over a deterministic doc order) and the stream is chopped into
    // fixed 2048-token context windows, so a document occupies the bin
    // span [first_bin, last_bin] and may cross a window boundary — the
    // packing rule GPT-family pipelines actually use (the
    // boundary-respecting first-fit variant is a sequential recurrence
    // per shard, deliberately not modeled here). Scale shape: ONE window
    // cumsum hash-partitioned by shard — no global sort, no recurrence;
    // at 100 TB each shard's running offset is an independent partition
    // of the window, and the bin ids are pure integer arithmetic on it.
    "x_sequence_packing" -> ((s, dir) => run(s, dir,
      """WITH t AS (
        |  SELECT doc_id, pmod(doc_id, 8) AS shard,
        |    size(split(text, '\\s+')) AS n_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, shard, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
        |  FROM t)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(start_tok + n_tokens AS BIGINT) AS end_tok,
        |  CAST(start_tok DIV 2048 AS BIGINT) AS first_bin,
        |  CAST((start_tok + n_tokens - 1) DIV 2048 AS BIGINT) AS last_bin,
        |  start_tok DIV 2048 <> (start_tok + n_tokens - 1) DIV 2048 AS spans_boundary
        |FROM packed""".stripMargin)),

    // Equal-frequency bucketing (NTILE), EXACT and distributed. A naive
    // `ntile(10) OVER (ORDER BY ...)` funnels the whole table through one
    // Exchange SinglePartition — the last global sort this board carried
    // (r10-r12's declared perf-weak entry). This form computes the SAME
    // answer (bit-identical to the DuckDB ntile oracle) with the classic
    // histogram-rank decomposition:
    //   1. per-value counts (one hash shuffle on n_chars, map-combined);
    //   2. a running-sum window over the DISTINCT-value histogram only —
    //      the single-partition pass touches |distinct lengths| rows
    //      (bounded by the length domain, ~10^4), never the corpus;
    //   3. global rank = broadcast offset + row_number PARTITION BY
    //      n_chars (hash-parallel, no range exchange anywhere);
    //   4. the rank->bucket map is ntile's closed form: the first N%10
    //      buckets take ceil(N/10) rows, the rest floor(N/10).
    // PlanAuditSpec pins the contract: no RangePartitioning, and the
    // full-table window runs under hashpartitioning(n_chars).
    "x_ntile_bucketing" -> ((s, dir) => run(s, dir,
      """WITH c AS (
        |  SELECT n_chars, count(*) AS cnt FROM documents GROUP BY n_chars),
        |o AS (
        |  SELECT n_chars, cnt,
        |    coalesce(sum(cnt) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS off,
        |    sum(cnt) OVER () AS n_total
        |  FROM c),
        |r AS (
        |  SELECT /*+ BROADCAST(o) */ d.doc_id, d.n_chars, o.n_total,
        |    o.off + row_number() OVER (PARTITION BY d.n_chars ORDER BY d.doc_id) AS rnk
        |  FROM documents d JOIN o ON d.n_chars = o.n_chars),
        |b AS (
        |  SELECT doc_id, n_chars,
        |    CAST(CASE
        |      WHEN rnk <= (n_total % 10) * (n_total DIV 10 + 1)
        |      THEN (rnk - 1) DIV (n_total DIV 10 + 1) + 1
        |      ELSE (n_total % 10)
        |        + (rnk - (n_total % 10) * (n_total DIV 10 + 1) - 1) DIV (n_total DIV 10) + 1
        |    END AS BIGINT) AS bucket
        |  FROM r)
        |SELECT bucket, count(*) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM b GROUP BY bucket""".stripMargin)),

    // Scale-safe equal-frequency bucketing: the 100 TB replacement for
    // ntile's global sort. Decile boundaries come from one mergeable
    // approx_percentile aggregate (a single tiny sketch, no sort); bucket
    // assignment is a broadcast nested-loop join of that one boundary row
    // against the scan — fully map-parallel. The boundary values are
    // sketch output and cannot hash-match another engine, so the oracle is
    // tolerance-boolean: every decile bucket must hold its fair share of
    // rows within 10%; DuckDB emits the same 10 bucket ids with literal
    // TRUEs (bucket balance is the semantic contract of equal-frequency
    // bucketing).
    "x_bucket_boundaries" -> ((s, dir) => run(s, dir,
      """WITH bs AS (
        |  SELECT approx_percentile(n_chars, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D), 10000) AS b
        |  FROM documents),
        |assigned AS (
        |  SELECT d.doc_id, CAST(1 + size(filter(bs.b, x -> x < d.n_chars)) AS BIGINT) AS bucket
        |  FROM documents d CROSS JOIN bs),
        |counts AS (SELECT bucket, count(*) AS cnt FROM assigned GROUP BY bucket),
        |tot AS (SELECT count(*) AS n FROM documents),
        |buckets AS (SELECT CAST(bucket AS BIGINT) AS bucket
        |            FROM (SELECT explode(sequence(1, 10)) AS bucket))
        |SELECT b.bucket,
        |  abs(CAST(coalesce(c.cnt, 0) AS DOUBLE) - CAST(t.n AS DOUBLE) / 10)
        |    <= 0.10 * CAST(t.n AS DOUBLE) / 10 AS balanced
        |FROM buckets b LEFT JOIN counts c ON b.bucket = c.bucket CROSS JOIN tot t""".stripMargin)),

    // Overlapping token-window chunking: 64-token chunks on a 48-token
    // stride (16-token overlap) — the tokenize-and-window step feeding a
    // training pipeline. Pure per-row flatMap (explode over a computed
    // chunk range): no shuffle at all; chunk identity is (doc_id,
    // chunk_id) and content is carried as an md5 so the oracle compare
    // stays compact.
    "x_doc_chunking" -> ((s, dir) => run(s, dir,
      """WITH w AS (SELECT doc_id, split(text, '\\s+') AS words FROM documents),
        |c AS (
        |  SELECT doc_id, words,
        |    explode(sequence(0, CAST((size(words) - 1) DIV 48 AS INT))) AS chunk_id
        |  FROM w)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(size(slice(words, chunk_id * 48 + 1, 64)) AS BIGINT) AS n_tokens,
        |  md5(array_join(slice(words, chunk_id * 48 + 1, 64), ' ')) AS chunk_hash
        |FROM c""".stripMargin)),

    // Stratified sampling: deterministic per-language rates (5% en / 20%
    // de / 50% everything else) gated by the shared 60-bit doc hash — the
    // reproducible downsampling step of a data mix. Pure filter: no
    // shuffle, no RNG, same sample on every engine and every run.
    "x_stratified_sample" -> ((s, dir) => run(s, dir,
      s"""SELECT doc_id, lang FROM documents
         |WHERE pmod(${h64("CAST(doc_id AS STRING)")}, 1000) <
         |  CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 200 ELSE 500 END""".stripMargin)),

    // Corpus term statistics: top-10 terms (length >= 4) per language by
    // frequency — explode + two-level aggregation; the shuffle key is
    // (lang, word) so the heavy explode output combines map-side before
    // moving, then the tiny per-lang top-k windows.
    // BPE tokenizer prep: the first merge iteration — adjacent
    // character-pair frequencies over the word-frequency table (count
    // once per distinct word, weight by word count: O(vocab × word
    // length) pair rows, never O(corpus chars)). Top-20 merge candidates
    // plan as TakeOrdered over the alphabet²-bounded pair table.
    "x_bpe_pairs" -> ((s, dir) => run(s, dir,
      """WITH w AS (
        |  SELECT word
        |  FROM documents LATERAL VIEW explode(split(lower(text), '[^a-z]+')) x AS word),
        |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wc FROM w WHERE length(word) >= 2 GROUP BY word),
        |pairs AS (
        |  SELECT pair, wc
        |  FROM wf LATERAL VIEW explode(transform(sequence(1, length(word) - 1),
        |    i -> substring(word, i, 2))) t AS pair),
        |pc AS (SELECT pair, CAST(SUM(wc) AS BIGINT) AS n FROM pairs GROUP BY pair)
        |SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS pos
        |FROM pc ORDER BY n DESC, pair LIMIT 20""".stripMargin)),

    // Tokenizer APPLICATION at scale: encode every word of every document
    // under a fixed rank-ordered BPE merge table (see [[bpeMerges]]).
    // This is the encode pass a training pipeline runs corpus-wide after
    // `x_bpe_train` learns the merges: a pure per-row map — HOF transform
    // + a folded replace chain, all inside whole-stage codegen — with
    // ZERO shuffles (the plan is scan -> project). Per-doc outputs are
    // the word/token counts, the tokens-per-word fertility (micro), and
    // a 60-bit hash of the full encoded sequence so the oracle compare
    // pins the exact segmentation, not just the counts.
    "x_bpe_encode" -> ((s, dir) => run(s, dir,
      s"""WITH w AS (SELECT doc_id, split(text, '\\\\s+') AS words FROM documents),
         |e AS (SELECT doc_id,
         |        transform(words, x -> ${bpeChain("regexp_replace(x, '(.)', '($1)')")}) AS enc
         |      FROM w),
         |t AS (SELECT doc_id, enc,
         |        CAST(size(enc) AS BIGINT) AS n_words,
         |        CAST(aggregate(enc, CAST(0 AS BIGINT),
         |          (acc, x) -> acc + length(x) - length(replace(x, '(', ''))) AS BIGINT) AS n_tokens
         |      FROM e)
         |SELECT doc_id, n_words, n_tokens,
         |  n_tokens * 1000000 DIV n_words AS fertility_micro,
         |  ${h64("array_join(enc, '|')")} AS enc_hash
         |FROM t""".stripMargin)),

    // Readability profile per language: mean word length, mean sentence
    // length (periods as sentence marks), and long-word share — the
    // complexity features a quality filter thresholds on. Everything is
    // an exact integer ratio over two combine-friendly lang groupBys;
    // output bounded by |langs|.
    "x_readability" -> ((s, dir) => run(s, dir,
      """WITH w AS (
        |  SELECT lang, word
        |  FROM documents LATERAL VIEW explode(split(text, '\\s+')) x AS word),
        |ws AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words, CAST(SUM(length(word)) AS BIGINT) AS chars,
        |       CAST(SUM(CASE WHEN length(word) >= 7 THEN 1 ELSE 0 END) AS BIGINT) AS long_words
        |       FROM w WHERE word <> '' GROUP BY lang),
        |s AS (SELECT lang, CAST(SUM(length(text) - length(replace(text, '.', '')) + 1) AS BIGINT) AS n_sent
        |      FROM documents GROUP BY lang)
        |SELECT ws.lang AS lang, ws.n_words, ws.chars * 1000 DIV ws.n_words AS milli_chars_per_word,
        |  ws.n_words * 1000 DIV s.n_sent AS milli_words_per_sentence,
        |  ws.long_words * 1000 DIV ws.n_words AS long_word_permille
        |FROM ws JOIN s ON s.lang = ws.lang""".stripMargin)),

    // Zipf-exponent fit: log-log OLS over the top-500 term ranks — the
    // standard "is this corpus natural language or template spam" QA
    // gate (natural text slopes ≈ -1). Per-term ln(rank)/ln(freq)
    // quantize to MILLI-units before the integer moments (the x_benford
    // discipline), so the slope is exact integer arithmetic end-to-end
    // and the model table is bounded at 500 rows however big the corpus.
    "x_zipf_fit" -> ((s, dir) => run(s, dir, zipfSql)),

    "x_term_stats" -> ((s, dir) => run(s, dir,
      """WITH t AS (
        |  SELECT lang, word
        |  FROM documents LATERAL VIEW explode(split(lower(text), '\\s+')) x AS word),
        |f AS (
        |  SELECT lang, word, count(*) AS freq
        |  FROM t WHERE length(word) >= 4 GROUP BY lang, word),
        |r AS (
        |  SELECT lang, word, freq,
        |    row_number() OVER (PARTITION BY lang ORDER BY freq DESC, word) AS rnk
        |  FROM f)
        |SELECT lang, word, freq, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 10""".stripMargin)),

    // Multimodal plumbing: opaque binary payload column + typed metadata,
    // deterministic "decode" features (real decode is a mapPartitions stub
    // — see multimodal.MultimodalSpec). Binary round-trips through the
    // engine; features derive from bytes only.
    // Multimodal AUDIO, decoded for REAL through the JDK's
    // javax.sound.sampled codec: a deterministic 16-bit PCM signal
    // synthesizes per doc, encodes as WAV, and every feature comes from
    // AudioSystem's DECODED sample stream — the oracle computes the
    // identical integers straight from the synthesis formula, so a hash
    // match proves a lossless codec round-trip, not a header sniff.
    // Partition-local mapPartitions, no shuffle; at 100 TB this is the
    // audio-featurization pass riding the first scan.
    "x_multimodal_audio" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.col
      Tables(s, dir, "documents")
        .filter(col("doc_id") % 17 === 0).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val samples = Array.tabulate(800) { i =>
              (((id * 7919L + i.toLong * 104729L) % 65536L) - 32768L).toShort
            }
            val wav = graft.multimodal.Multimodal.encodeWav(samples, 8000)
            val f = graft.multimodal.Multimodal.decodeAudio(wav).getOrElse(
              throw new IllegalStateException(s"WAV for doc $id failed to decode"))
            (id, f.sampleRate, f.channels, f.frames, f.rms, f.peak, wav.length.toLong)
          }
        }
        .toDF("doc_id", "sample_rate", "channels", "n_frames", "rms", "peak", "wav_bytes")
    }),

    "x_multimodal_features" -> ((s, dir) => run(s, dir,
      """WITH blobs AS (
        |  SELECT doc_id, source, encode(text, 'UTF-8') AS payload, length(text) AS meta_len FROM documents)
        |SELECT doc_id, source,
        |  CAST(octet_length(payload) AS BIGINT) AS payload_bytes,
        |  md5(payload) AS content_hash,
        |  substring(md5(payload), 1, 8) AS magic,
        |  CAST(meta_len AS BIGINT) AS meta_len
        |FROM blobs""".stripMargin))
  )

  def oracle: Map[String, String] = Map(
    "x_perplexity_lm" ->
      s"""WITH documents_uni AS (${UnicodeQueries.docsUniSql("duck")}),
        |w AS MATERIALIZED (
        |  SELECT doc_id, ${UnicodeQueries.uniWords("duck", "lower(text)")} AS ws
        |  FROM documents_uni),
        |bg AS MATERIALIZED (
        |  SELECT doc_id, ws[CAST(i AS INTEGER)] AS w1, ws[CAST(i + 1 AS INTEGER)] AS w2
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w WHERE len(ws) >= 2)),
        |c12 AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cu FROM c12 GROUP BY w1),
        |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS vocab FROM c12),
        |t AS (SELECT b.doc_id,
        |    CAST(FLOOR(ln(CAST(c1.cu + v.vocab AS DOUBLE) / CAST(m.c + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS nll_micro
        |  FROM bg b JOIN c12 m ON m.w1 = b.w1 AND m.w2 = b.w2
        |  JOIN c1 ON c1.w1 = b.w1 CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(nll_micro) AS BIGINT) // CAST(count(*) AS BIGINT) AS nll_avg_micro
        |FROM t GROUP BY doc_id""".stripMargin,

    "x_token_count" ->
      s"""WITH documents_uni AS (${UnicodeQueries.docsUniSql("duck")})
        |SELECT doc_id,
        |  len(string_split_regex(text, '\\s+')) AS ws_tokens,
        |  len(${UnicodeQueries.uniTokens("duck", "text")}) AS bpe_ish_tokens,
        |  length(text) AS n_chars_actual
        |FROM documents_uni""".stripMargin,

    "x_quality_score" ->
      """WITH w AS (SELECT doc_id, length(text) AS n_chars, string_split_regex(text, '\s+') AS words FROM documents)
        |SELECT doc_id, n_chars,
        |  len(words) AS n_words,
        |  CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS unique_ratio,
        |  CAST(len(list_filter(words, x -> x IN ('the','a','of','and'))) AS DOUBLE) / len(words) AS stopword_ratio,
        |  CAST(n_chars AS DOUBLE) / len(words) AS avg_word_len,
        |  0.5 * (CAST(len(list_distinct(words)) AS DOUBLE) / len(words))
        |    + 0.3 * (1.0 - CAST(len(list_filter(words, x -> x IN ('the','a','of','and'))) AS DOUBLE) / len(words))
        |    + 0.2 * least(CAST(len(words) AS DOUBLE) / 50.0, 1.0) AS quality_score
        |FROM w""".stripMargin,

    "x_fingerprint" ->
      s"""WITH w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM documents),
         |t AS (SELECT doc_id, words, unnest(generate_series(1, len(words))) AS i FROM w)
         |SELECT doc_id,
         |  CAST(sum(${duckH64("i::VARCHAR || ':' || words[i]")} % 1000000007) AS BIGINT) AS fingerprint,
         |  count(*) AS n_tokens
         |FROM t GROUP BY doc_id""".stripMargin,

    "x_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "x_shard_assignment" ->
      s"""WITH assigned AS (
         |  SELECT doc_id, n_chars, ${duckH64("text")} % 16 AS shard
         |  FROM documents)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  min(doc_id) AS first_doc
         |FROM assigned GROUP BY shard""".stripMargin,

    "x_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    len(string_split_regex(text, '\s+')) AS n_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, shard, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
        |  FROM t)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(start_tok + n_tokens AS BIGINT) AS end_tok,
        |  CAST(start_tok // 2048 AS BIGINT) AS first_bin,
        |  CAST((start_tok + n_tokens - 1) // 2048 AS BIGINT) AS last_bin,
        |  start_tok // 2048 <> (start_tok + n_tokens - 1) // 2048 AS spans_boundary
        |FROM packed""".stripMargin,

    "x_ntile_bucketing" ->
      """WITH b AS (
        |  SELECT doc_id, n_chars,
        |    CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS bucket
        |  FROM documents)
        |SELECT bucket, count(*) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM b GROUP BY bucket""".stripMargin,

    "x_bucket_boundaries" ->
      """SELECT CAST(bucket AS BIGINT) AS bucket, TRUE AS balanced
        |FROM (SELECT unnest(generate_series(1, 10)) AS bucket) t""".stripMargin,

    "x_doc_chunking" ->
      """WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS words FROM documents),
        |c AS (
        |  SELECT doc_id, words,
        |    unnest(generate_series(0, (len(words) - 1) // 48)) AS chunk_id
        |  FROM w)
        |SELECT doc_id, chunk_id,
        |  len(list_slice(words, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS n_tokens,
        |  md5(array_to_string(list_slice(words, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ')) AS chunk_hash
        |FROM c""".stripMargin,

    "x_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${duckH64("doc_id::VARCHAR")} % 1000 <
         |  CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 200 ELSE 500 END""".stripMargin,

    "x_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word FROM documents),
        |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wc FROM w WHERE length(word) >= 2 GROUP BY word),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, length(word)), i -> substring(word, CAST(i AS INTEGER), 2))) AS pair, wc
        |  FROM wf),
        |pc AS (SELECT pair, CAST(SUM(wc) AS BIGINT) AS n FROM pairs GROUP BY pair)
        |SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS pos
        |FROM pc ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    "x_bpe_encode" ->
      s"""WITH w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM documents),
         |e AS (SELECT doc_id,
         |        list_transform(words, x -> ${bpeChain("regexp_replace(x, '(.)', '(\\1)', 'g')")}) AS enc
         |      FROM w),
         |t AS (SELECT doc_id, enc,
         |        CAST(len(enc) AS BIGINT) AS n_words,
         |        CAST(list_sum(list_transform(enc,
         |          x -> len(x) - len(replace(x, '(', '')))) AS BIGINT) AS n_tokens
         |      FROM e)
         |SELECT doc_id, n_words, n_tokens,
         |  n_tokens * 1000000 // n_words AS fertility_micro,
         |  ${duckH64("array_to_string(enc, '|')")} AS enc_hash
         |FROM t""".stripMargin,

    "x_readability" ->
      """WITH w AS (
        |  SELECT lang, unnest(string_split_regex(text, '\s+')) AS word FROM documents),
        |ws AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words, CAST(SUM(length(word)) AS BIGINT) AS chars,
        |       CAST(SUM(CASE WHEN length(word) >= 7 THEN 1 ELSE 0 END) AS BIGINT) AS long_words
        |       FROM w WHERE word <> '' GROUP BY lang),
        |s AS (SELECT lang, CAST(SUM(length(text) - length(replace(text, '.', '')) + 1) AS BIGINT) AS n_sent
        |      FROM documents GROUP BY lang)
        |SELECT ws.lang AS lang, ws.n_words, ws.chars * 1000 // ws.n_words AS milli_chars_per_word,
        |  ws.n_words * 1000 // s.n_sent AS milli_words_per_sentence,
        |  ws.long_words * 1000 // ws.n_words AS long_word_permille
        |FROM ws JOIN s ON s.lang = ws.lang""".stripMargin,

    "x_zipf_fit" ->
      """WITH f AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
        |  WHERE length(word) >= 2 GROUP BY word),
        |r AS (
        |  SELECT freq, row_number() OVER (ORDER BY freq DESC, word) AS rnk
        |  FROM f),
        |q AS (
        |  SELECT CAST(FLOOR(ln(CAST(rnk AS DOUBLE)) * 1000) AS BIGINT) AS x,
        |    CAST(FLOOR(ln(CAST(freq AS DOUBLE)) * 1000) AS BIGINT) AS y
        |  FROM r WHERE rnk <= 500),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM q)
        |SELECT n AS n_terms,
        |  CAST((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx) AS BIGINT) AS zipf_slope_milli,
        |  CAST((sy - ((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx)) * sx // 1000)
        |    // n AS BIGINT) AS intercept_milli_ln
        |FROM m""".stripMargin,

    "x_term_stats" ->
      """WITH t AS (
        |  SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS word
        |  FROM documents),
        |f AS (
        |  SELECT lang, word, count(*) AS freq
        |  FROM t WHERE length(word) >= 4 GROUP BY lang, word),
        |r AS (
        |  SELECT lang, word, freq,
        |    row_number() OVER (PARTITION BY lang ORDER BY freq DESC, word) AS rnk
        |  FROM f)
        |SELECT lang, word, freq, rnk
        |FROM r WHERE rnk <= 10""".stripMargin,

    "x_multimodal_audio" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 17 = 0),
        |s AS (SELECT doc_id, unnest(generate_series(0, 799)) AS i FROM ids),
        |v AS (SELECT doc_id, ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS x FROM s)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(floor(sqrt(CAST(sum(x * x) // count(*) AS DOUBLE))) AS BIGINT) AS rms,
        |  CAST(max(abs(x)) AS BIGINT) AS peak,
        |  CAST(44 + 2 * count(*) AS BIGINT) AS wav_bytes
        |FROM v GROUP BY doc_id""".stripMargin,

    "x_multimodal_features" ->
      """SELECT doc_id, source,
        |  octet_length(encode(text)) AS payload_bytes,
        |  md5(text) AS content_hash,
        |  substr(md5(text), 1, 8) AS magic,
        |  length(text) AS meta_len
        |FROM documents""".stripMargin
  )
}
