package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators beyond the similarity/dedup family:
  * benchmark decontamination, PII redaction, repetition-based quality
  * filtering, deterministic train/valid/test splitting, incremental
  * (merge-of-partials) aggregate maintenance, and event-funnel /
  * retention-cohort analytics.
  *
  * Scale design notes per query live on the entries; the common thread is
  * that every operator is one scan plus hash-partition shuffles on an
  * explicit key — no global sorts, no all-pairs joins, and the only
  * broadcast is the (tiny) benchmark n-gram set in decontamination.
  *
  * Determinism (see the oracle conventions in AnalyticsQueries /
  * TextQueries): counts are BIGINT in both engines, money/value sums
  * aggregate as DECIMAL and cast to DOUBLE at the end, ratios are single
  * IEEE divisions of exact integers, and the shared 60-bit md5 hash
  * drives every pseudo-random assignment.
  */
object PipelineQueries extends QueryPack {
  import TextQueries.{h64, duckH64}

  private def docs(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql(sql)
  }

  private def events(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "events").createOrReplaceTempView("events")
    s.sql(sql)
  }

  // Deterministic synthetic PII suffix appended to each document — the
  // corpus text itself is clean, so redaction is exercised against known,
  // reproducible targets (one email, one IPv4, one phone per doc).
  private val sparkEnriched =
    """enriched AS (
      |  SELECT doc_id,
      |    concat(text, ' contact user', CAST(doc_id AS STRING), '@mail.example.com or ',
      |           '192.168.', CAST(pmod(doc_id, 256) AS STRING), '.', CAST(pmod(doc_id * 7, 256) AS STRING),
      |           ' phone 555-', lpad(CAST(pmod(doc_id, 10000) AS STRING), 4, '0')) AS text
      |  FROM documents)""".stripMargin

  private val duckEnriched =
    """enriched AS (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id::VARCHAR || '@mail.example.com or ' ||
      |    '192.168.' || (doc_id % 256)::VARCHAR || '.' || ((doc_id * 7) % 256)::VARCHAR ||
      |    ' phone 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS text
      |  FROM enriched_src)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Resample + forward fill (gap filling): each user's sparse daily
    // value series expands to a dense day grid over [first, last]
    // observation, carrying the last observed value across gap days —
    // the time-series regularization every downstream daily model
    // assumes. The grid explodes per-entity spans (bounded, never a
    // global calendar cross join), the fill is one
    // last_value-IGNORE-NULLS window per entity — one shuffle on
    // user_id, no global sort. Day sums stay DECIMAL until the final
    // per-row cast, so fills are exact cross-engine.
    "x_gap_fill" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      s.sql(
        """WITH days AS (
          |  SELECT user_id, unix_micros(ts) div 86400000000 AS day,
          |         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS day_value
          |  FROM events GROUP BY 1, 2),
          |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM days GROUP BY 1),
          |grid AS (
          |  SELECT user_id, explode(sequence(d0, d1)) AS day FROM span),
          |joined AS (
          |  SELECT g.user_id, g.day, d.day_value
          |  FROM grid g LEFT JOIN days d ON g.user_id = d.user_id AND g.day = d.day)
          |SELECT user_id, day, CAST(day_value AS DOUBLE) AS obs_value,
          |  CAST(last_value(day_value) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY day
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled_value
          |FROM joined""".stripMargin)
    }),

    // Entity resolution (record linkage): link typo-dirtied duplicate
    // records back to their canonical rows. Candidate generation is
    // DELETION-NEIGHBORHOOD blocking (the FastSS/SymSpell shape): each
    // name explodes to its 18 delete-one-character keys, and two names
    // within one substitution MUST share the key at the edited position
    // — an O(n·L) equi-join with no quadratic block anywhere (naive
    // per-nation blocking is O(block²); a levenshtein theta-join would
    // be all-pairs). The exact edit distance then verifies candidates
    // only. Deterministic dirty data: every third customer gets a
    // variant with one digit replaced at a key-derived position.
    "x_entity_resolution" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(
        """WITH dirty AS (
          |  SELECT c_custkey AS id, c_name AS name FROM customer
          |  UNION ALL
          |  SELECT c_custkey + 1000000 AS id,
          |    concat(substring(c_name, 1, 9 + pmod(c_custkey, 9)), 'z',
          |           substring(c_name, 11 + pmod(c_custkey, 9), 18)) AS name
          |  FROM customer WHERE c_custkey % 3 = 0),
          |keys AS (
          |  SELECT id, name, i,
          |    concat(substring(name, 1, i - 1), substring(name, i + 1, 18)) AS blk
          |  FROM dirty
          |  LATERAL VIEW explode(sequence(1, 18)) t AS i),
          |cand AS (
          |  SELECT DISTINCT a.id AS canonical_id, b.id AS dirty_id,
          |    a.name AS an, b.name AS bn
          |  FROM keys a JOIN keys b ON a.i = b.i AND a.blk = b.blk
          |  WHERE a.id < 1000000 AND b.id >= 1000000)
          |SELECT canonical_id, dirty_id,
          |  CAST(levenshtein(an, bn) AS BIGINT) AS dist
          |FROM cand WHERE levenshtein(an, bn) <= 1""".stripMargin)
    }),

    // Benchmark decontamination: flag corpus documents whose 8-gram
    // content overlaps a held-out eval set (doc_id % 97 = 0 stands in for
    // the benchmark). The eval n-gram table is tiny relative to the
    // corpus, so at 100 TB it broadcasts and the contamination check is a
    // map-side hash probe per corpus gram — one scan of the corpus, no
    // shuffle of the big side beyond the per-doc count.
    "x_decontamination" -> ((s, dir) => docs(s, dir,
      s"""WITH w AS (SELECT doc_id, split(text, '\\\\s+') AS words FROM documents
         |           WHERE size(split(text, '\\\\s+')) >= 8),
         |g AS (SELECT DISTINCT doc_id, gram_h FROM (
         |  SELECT doc_id, explode(transform(sequence(1, size(words) - 7),
         |    i -> ${h64("concat_ws(' ', slice(words, i, 8))")})) AS gram_h FROM w)),
         |eval_g AS (SELECT DISTINCT gram_h FROM g WHERE doc_id % 97 = 0),
         |corpus AS (SELECT doc_id, gram_h FROM g WHERE doc_id % 97 != 0)
         |SELECT c.doc_id, count(*) AS n_grams, count(e.gram_h) AS n_contaminated,
         |  CAST(count(e.gram_h) AS DOUBLE) / count(*) AS contamination,
         |  CAST(count(e.gram_h) AS DOUBLE) / count(*) >= 0.25 AS flagged
         |FROM corpus c LEFT JOIN eval_g e ON e.gram_h = c.gram_h
         |GROUP BY c.doc_id""".stripMargin)),

    // PII redaction: regex scrub of emails, IPv4s, and phone numbers with
    // per-class match counts and a hash of the redacted text (value-checked
    // against the oracle's identical redaction). Pure per-row map — no
    // shuffle at all; at 100 TB this is the classic pre-training scrub
    // pass that rides along with the first scan.
    // Privacy audit: k-anonymity / l-diversity over quasi-identifier
    // groups (language x length-bucket). Each group reports its size
    // (k), how many distinct sources it spans (l), and whether it meets
    // k>=10 / l>=3 — the release-gate a governed corpus checks before
    // rows with rare attribute combinations leak identity. One
    // map-combinable groupBy over the scan; output is bounded by the QI
    // domain, never corpus-sized.
    "x_k_anonymity" -> ((s, dir) => docs(s, dir,
      """SELECT lang, CAST(n_chars DIV 100 AS BIGINT) AS len_bucket,
        |  count(*) AS group_size,
        |  CAST(count(DISTINCT source) AS BIGINT) AS l_diversity,
        |  count(*) >= 10 AS k_anonymous,
        |  count(DISTINCT source) >= 3 AS l_diverse
        |FROM documents
        |GROUP BY lang, n_chars DIV 100""".stripMargin)),

    "x_pii_redaction" -> ((s, dir) => docs(s, dir,
      s"""WITH $sparkEnriched,
         |r AS (
         |  SELECT doc_id,
         |    CAST(size(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+\\\\.[a-z]+', 0)) AS BIGINT) AS n_emails,
         |    CAST(size(regexp_extract_all(text, '[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}', 0)) AS BIGINT) AS n_ips,
         |    CAST(size(regexp_extract_all(text, '555-[0-9]{4}', 0)) AS BIGINT) AS n_phones,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '[a-z0-9._]+@[a-z0-9.]+\\\\.[a-z]+', '<EMAIL>'),
         |      '[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}', '<IP>'),
         |      '555-[0-9]{4}', '<PHONE>') AS redacted
         |  FROM enriched)
         |SELECT doc_id, n_emails, n_ips, n_phones,
         |  md5(redacted) AS redacted_hash,
         |  (NOT redacted RLIKE '@') AS clean
         |FROM r""".stripMargin)),

    // Repetition-based quality filter: within-document duplicate 5-gram
    // ratio plus most-frequent-word share — the boilerplate/repetition
    // signals of a corpus quality pass. Shuffle keys are (doc_id) and
    // (doc_id, word); both aggregations combine map-side, so the explode
    // fan-out collapses before it moves.
    "x_repetition_filter" -> ((s, dir) => docs(s, dir,
      s"""WITH w AS (SELECT doc_id, split(text, '\\\\s+') AS words FROM documents
         |           WHERE size(split(text, '\\\\s+')) >= 5),
         |g AS (SELECT doc_id, explode(transform(sequence(1, size(words) - 4),
         |        i -> ${h64("concat_ws(' ', slice(words, i, 5))")})) AS gh FROM w),
         |gs AS (SELECT doc_id, count(*) AS n_grams, count(DISTINCT gh) AS n_distinct
         |       FROM g GROUP BY doc_id),
         |wf AS (SELECT doc_id, word, count(*) AS c
         |       FROM (SELECT doc_id, explode(words) AS word FROM w)
         |       GROUP BY doc_id, word),
         |tw AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS max_c, CAST(sum(c) AS BIGINT) AS n_words
         |       FROM wf GROUP BY doc_id)
         |SELECT g.doc_id, g.n_grams, g.n_distinct,
         |  1.0 - CAST(g.n_distinct AS DOUBLE) / g.n_grams AS dup_ratio,
         |  CAST(t.max_c AS DOUBLE) / t.n_words AS top_word_share,
         |  (1.0 - CAST(g.n_distinct AS DOUBLE) / g.n_grams) <= 0.5
         |    AND CAST(t.max_c AS DOUBLE) / t.n_words <= 0.2 AS keep
         |FROM gs g JOIN tw t ON t.doc_id = g.doc_id""".stripMargin)),

    // Deterministic train/valid/test split (90/5/5) keyed on the shared
    // 60-bit doc hash — reproducible on any engine and any run, no RNG.
    // Pure filter + one aggregation; the split column is also the natural
    // write-partition key at scale.
    "x_train_test_split" -> ((s, dir) => docs(s, dir,
      s"""WITH a AS (
         |  SELECT doc_id, lang, n_chars,
         |    CASE WHEN pmod(${h64("CAST(doc_id AS STRING)")}, 100) < 90 THEN 'train'
         |         WHEN pmod(${h64("CAST(doc_id AS STRING)")}, 100) < 95 THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM a GROUP BY split, lang""".stripMargin)),

    // Incremental aggregate maintenance: the corpus-stats table is kept
    // up to date by merging per-partition PARTIAL aggregates (counts,
    // decimal sums, min/max — all algebraic) instead of rescanning
    // history. Here the "stored" partial covers event_id % 10 < 7 and the
    // "delta" the rest; merging the two partial tables reproduces the
    // full recompute exactly (the oracle computes it flat). At 100 TB the
    // stored side is a tiny aggregate table and only the delta is
    // scanned.
    "x_incremental_agg" -> ((s, dir) => events(s, dir,
      """WITH part_old AS (
        |  SELECT event_type, count(*) AS n, SUM(CAST(value AS DECIMAL(12,2))) AS sv,
        |         min(value) AS mn, max(value) AS mx
        |  FROM events WHERE event_id % 10 < 7 GROUP BY event_type),
        |part_new AS (
        |  SELECT event_type, count(*) AS n, SUM(CAST(value AS DECIMAL(12,2))) AS sv,
        |         min(value) AS mn, max(value) AS mx
        |  FROM events WHERE event_id % 10 >= 7 GROUP BY event_type),
        |merged AS (
        |  SELECT event_type, n, sv, mn, mx FROM part_old
        |  UNION ALL SELECT event_type, n, sv, mn, mx FROM part_new)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(sum(sv) AS DOUBLE) AS total_value,
        |  min(mn) AS min_value, max(mx) AS max_value
        |FROM merged GROUP BY event_type""".stripMargin)),

    // Conversion funnel: strictly-ordered signup -> view -> click ->
    // purchase per user (each stage's timestamp must follow the prior
    // stage's). ONE scan + ONE user_id shuffle: the four stage times are
    // chained per-user window minimums over the same partitioning (each
    // stage's CASE references the prior window's result), the per-user
    // roll-up counts non-null stage times, and stack() emits the four
    // stage rows. (r14 rewrite — the prior chained-CTE form re-expanded
    // under Catalyst inlining into 5 corpus scans; hash-identical.)
    "x_funnel_analysis" -> ((s, dir) => events(s, dir,
      """WITH w AS (
        |  SELECT user_id, event_type, ts FROM events
        |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        |a1 AS (SELECT user_id, event_type, ts,
        |  min(CASE WHEN event_type = 'signup' THEN ts END) OVER (PARTITION BY user_id) AS t1 FROM w),
        |a2 AS (SELECT user_id, event_type, ts, t1,
        |  min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM a1),
        |a3 AS (SELECT user_id, event_type, ts, t1, t2,
        |  min(CASE WHEN event_type = 'click' AND ts > t2 THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM a2),
        |a4 AS (SELECT user_id, t1, t2, t3,
        |  min(CASE WHEN event_type = 'purchase' AND ts > t3 THEN ts END) OVER (PARTITION BY user_id) AS t4 FROM a3),
        |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3, max(t4) AS t4
        |      FROM a4 GROUP BY user_id),
        |c AS (SELECT CAST(count(t1) AS BIGINT) AS c1, CAST(count(t2) AS BIGINT) AS c2,
        |             CAST(count(t3) AS BIGINT) AS c3, CAST(count(t4) AS BIGINT) AS c4 FROM u)
        |SELECT stack(4, '1_signup', c1, '2_view', c2, '3_click', c3, '4_purchase', c4)
        |  AS (stage, n_users) FROM c""".stripMargin)),

    // Weekly retention cohorts: users grouped by first-seen week, counted
    // in each later week they return. Two aggregations on user_id plus
    // one on the (tiny) cohort grid; week arithmetic is integer day
    // difference DIV 7 so both engines agree exactly.
    "x_retention_cohorts" -> ((s, dir) => events(s, dir,
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events)
        |SELECT f.cohort, CAST(datediff(a.wk, f.cohort) DIV 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM a JOIN f ON f.user_id = a.user_id
        |GROUP BY f.cohort, datediff(a.wk, f.cohort) DIV 7""".stripMargin)),

    // Event-sequence transition matrix: count of consecutive
    // (prev_type -> next_type) steps per user stream, aggregated
    // corpus-wide, with the per-pair step share. The Markov-chain view of
    // user behavior; at 100 TB it is one window shuffle on user_id (the
    // session key) and one combine-friendly groupBy on a
    // (type x type)-bounded key space. (ts, event_id) is a unique total
    // order per user, so lag is deterministic.
    "x_event_transitions" -> ((s, dir) => events(s, dir,
      """WITH seq AS (
        |  SELECT user_id, event_type AS next_t,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
        |  FROM events),
        |pairs AS (
        |  SELECT prev_t, next_t, count(*) AS n
        |  FROM seq WHERE prev_t IS NOT NULL GROUP BY prev_t, next_t)
        |SELECT prev_t, next_t, CAST(n AS BIGINT) AS n,
        |  CAST(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_t) AS DOUBLE) AS DOUBLE) AS p_next
        |FROM pairs""".stripMargin)),

    // SCD2 history reconstruction: compress each user's event stream into
    // state-change rows with [valid_from, valid_to) intervals and a
    // current flag — the slowly-changing-dimension type-2 shape rebuilt
    // declaratively from raw history (the batch face of ops.Scd2.apply).
    // Two windows over one shuffle on user_id; (ts, event_id) is a unique
    // total order so change detection and interval ends are deterministic.
    // Distribution-drift audit between two corpus slices (baseline =
    // even event ids, candidate = odd — the deterministic stand-in for
    // "last week vs this week"): per event type, value histograms in ten
    // fixed buckets, integer permille shares, and the total-variation
    // distance between the two distributions in permille — the
    // input-drift gate a training pipeline runs before ingesting a new
    // crawl. Pure integer arithmetic end-to-end (shares are 1000*c DIV
    // total), so both engines derive identical values; scale shape: two
    // combine-friendly groupBys bounded by (type x 10 buckets).
    "x_distribution_drift" -> ((s, dir) => events(s, dir,
      """WITH j AS (
        |  SELECT event_type, event_id % 2 AS half,
        |    CAST(least(floor(value / 10), 9) AS BIGINT) AS b
        |  FROM events WHERE value IS NOT NULL),
        |t AS (SELECT event_type, half, count(*) AS tot FROM j GROUP BY event_type, half),
        |c AS (SELECT event_type, half, b, count(*) AS c FROM j GROUP BY event_type, half, b),
        |sh AS (SELECT c.event_type, c.b, c.half, (1000 * c.c) DIV t.tot AS share
        |       FROM c JOIN t ON t.event_type = c.event_type AND t.half = c.half),
        |p AS (SELECT event_type, b,
        |    sum(CASE WHEN half = 0 THEN share ELSE 0 END) AS s0,
        |    sum(CASE WHEN half = 1 THEN share ELSE 0 END) AS s1
        |  FROM sh GROUP BY event_type, b)
        |SELECT event_type,
        |  CAST(sum(abs(s0 - s1)) DIV 2 AS BIGINT) AS tvd_permille,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(max(abs(s0 - s1)) AS BIGINT) AS worst_bucket_permille
        |FROM p GROUP BY event_type""".stripMargin)),

    "x_scd2_history" -> ((s, dir) => events(s, dir,
      """WITH s AS (
        |  SELECT user_id, event_type AS state, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |chg AS (
        |  SELECT user_id, state, ts, event_id FROM s
        |  WHERE prev IS NULL OR state != prev)
        |SELECT user_id, state,
        |  unix_millis(ts) AS valid_from_ms,
        |  unix_millis(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_ms,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM chg""".stripMargin)),

    // Marketing attribution (first-touch AND last-touch in one pass):
    // each purchase credits the non-purchase event that opened (first)
    // and most recently preceded (last) it in the user's stream. Both
    // credits come from ONE window pass per user — last_value/first_value
    // IGNORE NULLS over "rows before me" share a window spec, so Catalyst
    // fuses them into a single Window operator — and the two attribution
    // models aggregate in ONE pass via GROUPING SETS (a UNION ALL of the
    // two views would make Catalyst duplicate the whole scan+window
    // subtree — plan-audited in PlanAuditSpec). At 100 TB: one scan, one
    // shuffle on user_id, one Expand (2 rows/conversion), one
    // channel-bounded aggregate. (ts, event_id) is a unique total order
    // per user ⇒ deterministic. first_touch IS NULL exactly when
    // last_touch IS NULL (same preceding-rows frame), so one filter
    // covers both models.
    "x_attribution" -> ((s, dir) => events(s, dir,
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END) IGNORE NULLS
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END) IGNORE NULLS
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch
        |  FROM events),
        |conv AS (SELECT * FROM seq WHERE event_type = 'purchase' AND last_touch IS NOT NULL)
        |SELECT CASE WHEN grouping(last_touch) = 0 THEN 'last_touch' ELSE 'first_touch' END AS model,
        |  coalesce(last_touch, first_touch) AS channel,
        |  CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |FROM conv
        |GROUP BY GROUPING SETS ((last_touch), (first_touch))""".stripMargin)),

    // RFM segmentation with SCALE-SAFE quintile scores: per-user
    // recency/frequency/monetary aggregate (one combine-friendly groupBy
    // on user_id), then each score reads the user's position in the
    // metric's cumulative distribution — built by grouping ON THE VALUE
    // (recency hours and frequency are bounded domains; monetary bins to
    // $100) so every window runs over a distinct-value table, never over
    // users. score = below·5 DIV n + 1 ∈ 1..5; ties share a score by
    // construction. No ntile, no global sort over the user dimension —
    // the x_bucket_boundaries discipline applied to the classic
    // marketing segmentation.
    // The per-user (recency, frequency, monetary) aggregate is CACHED
    // (Tables.cacheView, the pagerank discipline): the three score
    // distributions and the final join all read it, and as a plain CTE
    // Catalyst would re-execute the events scan once per reference
    // (5× the corpus pass at 100 TB). The cached table is |users| rows.
    "x_rfm_segmentation" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      Tables.cacheView("rfm_users", s.sql(
        """SELECT user_id,
          |  ((SELECT max(unix_micros(ts)) FROM events) - max(unix_micros(ts))) DIV 3600000000 AS rec,
          |  CAST(count(*) AS BIGINT) AS freq,
          |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mon
          |FROM events GROUP BY user_id""".stripMargin))
      s.sql(
      """WITH ub AS (SELECT user_id, rec, freq, mon, mon DIV 10000 AS mb FROM rfm_users),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ub),
        |rdist AS (
        |  SELECT v, coalesce(sum(c) OVER (ORDER BY v DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
        |  FROM (SELECT rec AS v, count(*) AS c FROM ub GROUP BY rec) g1),
        |fdist AS (
        |  SELECT v, coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM (SELECT freq AS v, count(*) AS c FROM ub GROUP BY freq) g2),
        |mdist AS (
        |  SELECT v, coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM (SELECT mb AS v, count(*) AS c FROM ub GROUP BY mb) g3)
        |SELECT ub.user_id, CAST(ub.rec AS BIGINT) AS recency_hours,
        |  ub.freq AS frequency, ub.mon AS monetary_cents,
        |  CAST(rdist.above * 5 DIV n.n + 1 AS BIGINT) AS r_score,
        |  CAST(fdist.below * 5 DIV n.n + 1 AS BIGINT) AS f_score,
        |  CAST(mdist.below * 5 DIV n.n + 1 AS BIGINT) AS m_score
        |FROM ub CROSS JOIN n
        |JOIN rdist ON rdist.v = ub.rec
        |JOIN fdist ON fdist.v = ub.freq
        |JOIN mdist ON mdist.v = ub.mb""".stripMargin)
    }),

    // A/B experiment readout: deterministic 50/50 hash split of users,
    // conversion = any $200+ purchase, two-proportion pooled z-score in
    // integer micro-units. The whole analysis is two user-keyed
    // aggregates collapsing to ONE row — at 100 TB the only shuffle is
    // the distinct-user pass; the z arithmetic is correctly-rounded IEEE
    // doubles over exact integers in a textually identical expression
    // tree, so the oracle hash-matches to the bit (the x_anomaly_zscore
    // discipline).
    // NOTE assignment + conversion come from ONE per-user pass (max of a
    // conversion indicator) rather than a distinct-users LEFT JOIN
    // distinct-converters — that formulation scans events twice.
    "x_ab_test" -> ((s, dir) => events(s, dir,
      s"""WITH pu AS (
         |  SELECT user_id, ${TextQueries.h64("CAST(user_id AS STRING)")} % 2 AS variant,
         |    max(CASE WHEN event_type = 'purchase' AND CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 20000
         |             THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY user_id),
         |v AS (
         |  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
         |    CAST(SUM(conv) AS BIGINT) AS n_conv
         |  FROM pu GROUP BY variant),
         |ab AS (
         |  SELECT
         |    max(CASE WHEN variant = 0 THEN n_users END) AS n_a,
         |    max(CASE WHEN variant = 0 THEN n_conv END) AS c_a,
         |    max(CASE WHEN variant = 1 THEN n_users END) AS n_b,
         |    max(CASE WHEN variant = 1 THEN n_conv END) AS c_b
         |  FROM v)
         |SELECT n_a, c_a, n_b, c_b,
         |  c_a * 1000 DIV n_a AS cr_a_permille,
         |  c_b * 1000 DIV n_b AS cr_b_permille,
         |  CAST(FLOOR((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         |    / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) * (CAST(1 AS DOUBLE) - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
         |      * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE))) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS z_micro
         |FROM ab""".stripMargin)),

    // CUPED variance reduction (the pre-experiment-covariate adjustment
    // every mature experimentation platform applies before reading an
    // A/B test): per user, x = pre-period spend, y = experiment-period
    // spend; θ = cov(x,y)/var(x); adjusted metric y − θ(x − x̄). Every
    // output derives in CLOSED FORM from six exact integer moments
    // (n, Σx, Σy, Σxy, Σx², Σy² + per-variant sums) — never a mean or
    // variance over per-row doubles, whose summation order would differ
    // across engines. var_reduction = ρ² in permille. One combine-
    // friendly user groupBy then a one-row moment aggregate: at 100 TB
    // the only shuffle is the per-user pass.
    "x_ab_cuped" -> ((s, dir) => events(s, dir,
      s"""WITH b AS (
         |  SELECT min(unix_micros(ts)) AS lo, max(unix_micros(ts)) AS hi FROM events),
         |per_user AS (
         |  SELECT user_id, ${TextQueries.h64("CAST(user_id AS STRING)")} % 2 AS variant,
         |    CAST(SUM(CASE WHEN unix_micros(ts) * 2 < (SELECT lo + hi FROM b) THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         |    CAST(SUM(CASE WHEN unix_micros(ts) * 2 >= (SELECT lo + hi FROM b) THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
         |  FROM events GROUP BY user_id),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(y * y) AS BIGINT) AS syy,
         |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
         |    CAST(SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
         |    CAST(SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b
         |  FROM per_user)
         |SELECT n_a, n_b,
         |  CAST(FLOOR((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)) * CAST(1000 AS DOUBLE)) AS BIGINT) AS diff_raw_millicents,
         |  CAST(FLOOR(((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         |    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
         |      * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))) * CAST(1000 AS DOUBLE)) AS BIGINT) AS diff_cuped_millicents,
         |  CAST(FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS theta_micro,
         |  CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * CAST(1000 AS DOUBLE)) AS BIGINT) AS var_reduction_permille
         |FROM m""".stripMargin)),

    // Deadline funnel: unlike x_funnel_analysis (any later time), each
    // stage must land within 72 h of the previous stage's first event —
    // the conversion-window semantics real funnel dashboards use. Same
    // r14 one-scan shape as x_funnel_analysis (chained per-user window
    // minimums over one user_id shuffle); the deadline is a per-row
    // predicate inside each stage's CASE.
    "x_funnel_windowed" -> ((s, dir) => events(s, dir,
      """WITH w AS (
        |  SELECT user_id, event_type, ts FROM events
        |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        |a1 AS (SELECT user_id, event_type, ts,
        |  min(CASE WHEN event_type = 'signup' THEN ts END) OVER (PARTITION BY user_id) AS t1 FROM w),
        |a2 AS (SELECT user_id, event_type, ts, t1,
        |  min(CASE WHEN event_type = 'view' AND ts > t1 AND ts <= t1 + INTERVAL 72 HOUR THEN ts END)
        |    OVER (PARTITION BY user_id) AS t2 FROM a1),
        |a3 AS (SELECT user_id, event_type, ts, t1, t2,
        |  min(CASE WHEN event_type = 'click' AND ts > t2 AND ts <= t2 + INTERVAL 72 HOUR THEN ts END)
        |    OVER (PARTITION BY user_id) AS t3 FROM a2),
        |a4 AS (SELECT user_id, t1, t2, t3,
        |  min(CASE WHEN event_type = 'purchase' AND ts > t3 AND ts <= t3 + INTERVAL 72 HOUR THEN ts END)
        |    OVER (PARTITION BY user_id) AS t4 FROM a3),
        |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3, max(t4) AS t4
        |      FROM a4 GROUP BY user_id),
        |c AS (SELECT CAST(count(t1) AS BIGINT) AS c1, CAST(count(t2) AS BIGINT) AS c2,
        |             CAST(count(t3) AS BIGINT) AS c3, CAST(count(t4) AS BIGINT) AS c4 FROM u)
        |SELECT stack(4, '1_signup', c1, '2_view_72h', c2, '3_click_72h', c3, '4_purchase_72h', c4)
        |  AS (stage, n_users) FROM c""".stripMargin)),

    // Day-of-week seasonality profile: per (type, ISO weekday) volume,
    // mean value, and the ratio to the type's overall mean in integer
    // permille — the seasonal-baseline table an anomaly detector joins
    // against. Two combine-friendly groupBys bounded by (type × 7);
    // ratios are exact integer cross-multiplication, no division of
    // doubles anywhere.
    // NOTE type totals come from a window over the (type × 7) roll-up —
    // a joined aggregate CTE would re-execute the events scan twice.
    "x_seasonality" -> ((s, dir) => events(s, dir,
      """WITH e AS (
        |  SELECT event_type, weekday(ts) + 1 AS dow, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |d AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
        |      FROM e GROUP BY event_type, dow),
        |d2 AS (SELECT event_type, dow, n, s,
        |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS tn,
        |    CAST(SUM(s) OVER (PARTITION BY event_type) AS BIGINT) AS ts
        |  FROM d)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow, n,
        |  s * 1000 DIV n AS mean_millicents,
        |  (s * tn * 1000) DIV (ts * n) AS vs_type_mean_permille
        |FROM d2""".stripMargin)),

    // Cohort LTV curves: per signup-week cohort, cumulative revenue by
    // week offset and per-capita lifetime value — the curve growth teams
    // read cohort health from. The cumulative window runs over the
    // (cohort × week-offset) GRID, never over events; the per-event work
    // is two user-keyed aggregates (first-seen, revenue roll-up).
    // NOTE cohort sizes ride a window over the per-user first-seen table
    // and roll through the revenue aggregate — a separate cohort-size
    // CTE joined at the end would re-execute the first-seen scan twice.
    "x_cohort_ltv" -> ((s, dir) => events(s, dir,
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |           FROM events GROUP BY user_id),
        |f2 AS (SELECT user_id, cohort,
        |    CAST(count(*) OVER (PARTITION BY cohort) AS BIGINT) AS cohort_users FROM f),
        |rev AS (
        |  SELECT f2.cohort, datediff(CAST(e.ts AS DATE), f2.cohort) DIV 7 AS wk,
        |    CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents,
        |    max(f2.cohort_users) AS cohort_users
        |  FROM events e JOIN f2 ON f2.user_id = e.user_id
        |  GROUP BY f2.cohort, datediff(CAST(e.ts AS DATE), f2.cohort) DIV 7),
        |cum AS (
        |  SELECT cohort, wk, cohort_users, sum(cents) OVER (PARTITION BY cohort ORDER BY wk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
        |  FROM rev)
        |SELECT cohort, CAST(wk AS BIGINT) AS week_offset,
        |  CAST(cum_cents AS BIGINT) AS cum_cents,
        |  CAST(cum_cents * 1000 DIV cohort_users AS BIGINT) AS ltv_millicents_per_user
        |FROM cum""".stripMargin)),

    // User-journey path mining (the Sankey-diagram feed): top 20 3-step
    // event-type paths with corpus share in ppm. One window shuffle on
    // user_id (two leads in the same ordered pass), a groupBy bounded by
    // |types|³ paths, and a global top-20 that plans as TakeOrdered.
    // NOTE the share comes from sum(n) OVER () rather than a joined
    // total CTE: referencing `paths` twice would make Catalyst inline
    // (re-execute) the whole scan+window subtree — measured 2× the
    // events pass at sf1. The unpartitioned window runs over the
    // |types|³-bounded paths table only.
    "x_sankey_paths" -> ((s, dir) => events(s, dir,
      """WITH seq AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events),
        |paths AS (
        |  SELECT concat(e1, '>', e2, '>', e3) AS path, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE e3 IS NOT NULL GROUP BY concat(e1, '>', e2, '>', e3))
        |SELECT path, n, n * 1000000 DIV CAST(sum(n) OVER () AS BIGINT) AS share_ppm,
        |  CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS pos
        |FROM paths
        |ORDER BY n DESC, path LIMIT 20""".stripMargin)),

    // Experiment power analysis: the minimum detectable absolute effect
    // (alpha 0.05 two-sided, power 0.80) the current user count supports
    // at the observed baseline conversion — the "is this test even worth
    // running" readout next to x_ab_test. Collapses to one row from two
    // user-keyed aggregates; z constants are exact rational literals so
    // the IEEE expression tree is engine-identical.
    "x_power_analysis" -> ((s, dir) => events(s, dir,
      s"""WITH pu AS (
         |  SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' AND CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 20000
         |             THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY user_id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(conv) AS BIGINT) AS c FROM pu)
         |SELECT n AS n_users, c AS n_conv, c * 1000 DIV n AS baseline_permille,
         |  CAST(FLOOR((CAST(196 AS DOUBLE) / CAST(100 AS DOUBLE) + CAST(84 AS DOUBLE) / CAST(100 AS DOUBLE))
         |    * sqrt(CAST(2 AS DOUBLE) * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(1 AS DOUBLE) - CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) / CAST(2 AS DOUBLE)))
         |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS mde_abs_micro
         |FROM m""".stripMargin)),

    // Changepoint detection (CUSUM): per type, the day where the
    // cumulative daily-revenue deviation from a uniform rate peaks —
    // level-shift localization over a metric stream. Daily sums are one
    // combine-friendly groupBy; the cumulative window and the argmax run
    // over the (type × day) table only. Deviation compares cum·D against
    // idx·total by exact integer cross-multiplication.
    // NOTE the per-type totals (nd, tot) ride the SAME window pass as
    // the running sum — a separate aggregate CTE joined back would make
    // Catalyst re-execute the daily roll-up (and its events scan) twice.
    "x_changepoint" -> ((s, dir) => events(s, dir,
      """WITH d AS (
        |  SELECT event_type, unix_micros(ts) DIV 86400000000 AS day,
        |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY event_type, unix_micros(ts) DIV 86400000000),
        |c AS (
        |  SELECT d.event_type, d.day,
        |    CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS idx,
        |    CAST(sum(d.s) OVER (PARTITION BY d.event_type ORDER BY d.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(count(*) OVER (PARTITION BY d.event_type) AS BIGINT) AS nd,
        |    CAST(sum(d.s) OVER (PARTITION BY d.event_type) AS BIGINT) AS tot
        |  FROM d),
        |dev AS (
        |  SELECT event_type, day, abs(cum * nd - idx * tot) AS raw_dev,
        |    abs(cum * nd - idx * tot) * 1000 DIV (nd * tot) AS dev_permille
        |  FROM c),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY raw_dev DESC, day) AS rn FROM dev)
        |SELECT event_type, CAST(day AS BIGINT) AS changepoint_day, CAST(dev_permille AS BIGINT) AS dev_permille
        |FROM rk WHERE rn = 1""".stripMargin)),

    // Growth accounting: every (user, day) activity classifies as
    // new / retained / resurrected, and churn events mint at the day
    // AFTER a user's last activity in a gap — the DAU decomposition
    // every growth team reads. One distinct pass, one user-keyed window
    // (lag + lead share the spec), and the churn twin row comes from
    // exploding each activity row into its ≤2 ledger entries — NOT a
    // UNION ALL re-reading the window CTE (Catalyst would re-execute
    // the whole subtree; see the CTE-inlining notes on x_sankey_paths).
    // The global max day is a scalar subquery — one extra min/max scan,
    // never a single-partition window.
    "x_growth_accounting" -> ((s, dir) => events(s, dir,
      """WITH a AS (SELECT DISTINCT user_id, unix_micros(ts) DIV 86400000000 AS day FROM events),
        |s AS (SELECT user_id, day, lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
        |             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt FROM a),
        |st AS (
        |  SELECT e.d AS day, e.cat AS cat
        |  FROM s LATERAL VIEW explode(array(
        |    named_struct('d', day, 'cat',
        |      CASE WHEN prev IS NULL THEN 'new'
        |           WHEN day = prev + 1 THEN 'retained'
        |           ELSE 'resurrected' END),
        |    named_struct('d', day + 1, 'cat',
        |      CASE WHEN nxt IS NULL OR nxt > day + 1 THEN 'churned' END))) t AS e
        |  WHERE e.cat IS NOT NULL
        |    AND e.d <= (SELECT max(unix_micros(ts) DIV 86400000000) FROM events))
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(SUM(CASE WHEN cat = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN cat = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(SUM(CASE WHEN cat = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        |  CAST(SUM(CASE WHEN cat = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
        |FROM st GROUP BY day""".stripMargin)),

    // EXACT rolling actives (DAU / 7-day WAU / stickiness): each
    // activity day explodes into the ≤7 window-days it supports, then
    // ONE aggregate computes both distinct counts (i=0 marks the exact
    // day) — no 7-way self-join, no sliding-window state, and no second
    // read of the distinct-activity CTE. The explosion factor is the
    // window length (a constant), so cost is 7× the (user, day) table —
    // the standard exact sliding-distinct shape at any scale.
    "x_rolling_actives" -> ((s, dir) => events(s, dir,
      """WITH a AS (SELECT DISTINCT user_id, unix_micros(ts) DIV 86400000000 AS day FROM events),
        |sup AS (SELECT user_id, day + i AS wday, i
        |        FROM a LATERAL VIEW explode(sequence(0, 6)) t AS i),
        |g AS (SELECT wday, count(DISTINCT user_id) AS wau,
        |             count(DISTINCT CASE WHEN i = 0 THEN user_id END) AS dau
        |      FROM sup GROUP BY wday)
        |SELECT CAST(wday AS BIGINT) AS day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
        |  CAST(dau * 1000 DIV wau AS BIGINT) AS stickiness_permille
        |FROM g WHERE wday <= (SELECT max(unix_micros(ts) DIV 86400000000) FROM events)""".stripMargin)),

    // Conversion-lag percentiles: p50/p90/p99 hours from first signup to
    // first subsequent purchase. The signup-time CTE rides THROUGH the
    // purchase aggregate (min(t1) — constant per user) so it is read
    // once; the order statistics come from the value-grouped cumulative
    // distribution over the bounded hours domain — the same no-sort
    // discipline as x_exact_quantiles, with the n total as a window.
    "x_conversion_lag" -> ((s, dir) => events(s, dir,
      """WITH su AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |pu AS (SELECT e.user_id, min(su.t1) AS t1, min(e.ts) AS t2
        |       FROM events e JOIN su ON su.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > su.t1 GROUP BY e.user_id),
        |lg AS (SELECT (unix_micros(t2) - unix_micros(t1)) DIV 3600000000 AS v FROM pu),
        |h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM lg GROUP BY v),
        |cum AS (SELECT v, c,
        |    CAST(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cend,
        |    CAST(SUM(c) OVER () AS BIGINT) AS n
        |  FROM h)
        |SELECT CAST(p AS BIGINT) AS p, CAST(v AS BIGINT) AS lag_hours, n AS n_converters
        |FROM cum CROSS JOIN (SELECT explode(array(50, 90, 99)) AS p) ps
        |WHERE cend >= ((n - 1) * p) DIV 100 + 1 AND cend - c < ((n - 1) * p) DIV 100 + 1""".stripMargin)),

    // Robust dispersion (median + MAD) per type, entirely over the
    // value-grouped dollar distribution: the median is picked by a
    // window over the bounded (type × dollar) table, the absolute
    // deviations re-group THAT table (never the corpus), and the MAD is
    // the same order-statistic pick over the deviation distribution.
    // Every CTE is referenced exactly once — one events scan total; all
    // windows partition by type over distribution rows.
    "x_robust_stats" -> ((s, dir) => events(s, dir,
      """WITH d AS (
        |  SELECT event_type AS g, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) DIV 100 AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) DIV 100),
        |w AS (
        |  SELECT g, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cend,
        |    CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM d),
        |m AS (
        |  SELECT g, v, c, cend, n,
        |    CAST(max(CASE WHEN cend - c < ((n - 1) * 50) DIV 100 + 1 AND cend >= ((n - 1) * 50) DIV 100 + 1 THEN v END)
        |      OVER (PARTITION BY g) AS BIGINT) AS med
        |  FROM w),
        |dev AS (
        |  SELECT g, abs(v - med) AS dv, CAST(SUM(c) AS BIGINT) AS c, max(n) AS n, max(med) AS med
        |  FROM m GROUP BY g, abs(v - med)),
        |dw AS (
        |  SELECT g, dv, c, n, med,
        |    CAST(SUM(c) OVER (PARTITION BY g ORDER BY dv ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cend
        |  FROM dev),
        |mk AS (
        |  SELECT g, med, n,
        |    CAST(max(CASE WHEN cend - c < ((n - 1) * 50) DIV 100 + 1 AND cend >= ((n - 1) * 50) DIV 100 + 1 THEN dv END)
        |      OVER (PARTITION BY g) AS BIGINT) AS mad
        |  FROM dw)
        |SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n,
        |  max(med) AS median_dollars, max(mad) AS mad_dollars
        |FROM mk GROUP BY g""".stripMargin)),

    // Winsorized mean + Tukey-fence outlier counts per type: p5/p95/q1/q3
    // materialize as FOUR window marks in one type-partitioned pass over
    // the bounded distribution table, the winsorized sum clamps values
    // row-wise, and the 1.5·IQR fences compare by integer
    // cross-multiplication (2v vs 2q ± 3·IQR — no fractions). One events
    // scan, every CTE referenced once.
    "x_winsorized" -> ((s, dir) => events(s, dir,
      """WITH d AS (
        |  SELECT event_type AS g, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) DIV 100 AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) DIV 100),
        |w AS (
        |  SELECT g, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cend,
        |    CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM d),
        |m AS (
        |  SELECT g, v, c, n,
        |    CAST(max(CASE WHEN cend - c < ((n - 1) * 5) DIV 100 + 1 AND cend >= ((n - 1) * 5) DIV 100 + 1 THEN v END) OVER (PARTITION BY g) AS BIGINT) AS p5,
        |    CAST(max(CASE WHEN cend - c < ((n - 1) * 95) DIV 100 + 1 AND cend >= ((n - 1) * 95) DIV 100 + 1 THEN v END) OVER (PARTITION BY g) AS BIGINT) AS p95,
        |    CAST(max(CASE WHEN cend - c < ((n - 1) * 25) DIV 100 + 1 AND cend >= ((n - 1) * 25) DIV 100 + 1 THEN v END) OVER (PARTITION BY g) AS BIGINT) AS q1,
        |    CAST(max(CASE WHEN cend - c < ((n - 1) * 75) DIV 100 + 1 AND cend >= ((n - 1) * 75) DIV 100 + 1 THEN v END) OVER (PARTITION BY g) AS BIGINT) AS q3
        |  FROM w)
        |SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(q1) AS BIGINT) AS q1_dollars, CAST(max(q3) AS BIGINT) AS q3_dollars,
        |  CAST(SUM(c * least(greatest(v, p5), p95)) * 1000 DIV max(n) AS BIGINT) AS winsorized_mean_millidollars,
        |  CAST(SUM(CASE WHEN 2 * v < 2 * q1 - 3 * (q3 - q1) OR 2 * v > 2 * q3 + 3 * (q3 - q1) THEN c ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(SUM(CASE WHEN 2 * v < 2 * q1 - 3 * (q3 - q1) OR 2 * v > 2 * q3 + 3 * (q3 - q1) THEN c ELSE 0 END) * 1000000 DIV max(n) AS BIGINT) AS outlier_ppm
        |FROM m GROUP BY g""".stripMargin)),

    // Two-sample Kolmogorov–Smirnov: max CDF gap between the first and
    // second half of the purchase-value stream — the distribution-shift
    // test next to x_distribution_drift's TVD. Both empirical CDFs come
    // from ONE value-grouped table (dollar bins) with cumulative windows
    // over the bounded distinct-value domain; the gap compares
    // F0·n1 vs F1·n0 by exact integer cross-multiplication, and the
    // scaled KS statistic is one closed-form IEEE expression over the
    // final integers.
    "x_ks_test" -> ((s, dir) => events(s, dir,
      """WITH b AS (SELECT min(unix_micros(ts)) AS lo, max(unix_micros(ts)) AS hi FROM events),
        |e AS (
        |  SELECT CASE WHEN unix_micros(ts) * 2 < (SELECT lo + hi FROM b) THEN 0 ELSE 1 END AS half,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) DIV 100 AS dollars
        |  FROM events WHERE event_type = 'purchase'),
        |d AS (SELECT half, dollars, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY half, dollars),
        |g AS (SELECT dollars,
        |    CAST(SUM(CASE WHEN half = 0 THEN c ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN half = 1 THEN c ELSE 0 END) AS BIGINT) AS c1
        |  FROM d GROUP BY dollars),
        |cum AS (
        |  SELECT dollars,
        |    CAST(SUM(c0) OVER (ORDER BY dollars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f0,
        |    CAST(SUM(c1) OVER (ORDER BY dollars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
        |    CAST(SUM(c0) OVER () AS BIGINT) AS n0, CAST(SUM(c1) OVER () AS BIGINT) AS n1
        |  FROM g),
        |ks AS (SELECT dollars, abs(f0 * n1 - f1 * n0) AS dev, n0, n1 FROM cum),
        |mx AS (SELECT * FROM ks ORDER BY dev DESC, dollars LIMIT 1)
        |SELECT n0 AS n_first, n1 AS n_second, dollars AS ks_at_dollars,
        |  dev * 1000 DIV (n0 * n1) AS ks_permille,
        |  CAST(FLOOR(sqrt((CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
        |    * (CAST(dev AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))) * CAST(1000 AS DOUBLE)) AS BIGINT) AS ks_stat_milli
        |FROM mx""".stripMargin)),

    // Benford first-digit audit (the classic fraud/synthetic-data
    // screen): observed first-digit shares of the value column vs
    // Benford's law in ppm. One digit-bounded groupBy; the 9 expected
    // shares quantize ln(1+1/d)/ln(10) to ppm — the x_bigram_lm
    // discipline (quantized at a fixed 9-value domain, libm-safe by
    // construction: an ulp of ln error is ~10 orders below the floor
    // granularity for these inputs).
    "x_benford" -> ((s, dir) => events(s, dir,
      """WITH c AS (
        |  SELECT CAST(substring(CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS STRING), 1, 1) AS BIGINT) AS d
        |  FROM events WHERE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 1),
        |f AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY d),
        |t AS (SELECT d, n, CAST(SUM(n) OVER () AS BIGINT) AS tot FROM f),
        |e AS (SELECT d, n, tot,
        |    CAST(FLOOR(ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(d AS DOUBLE)) / ln(CAST(10 AS DOUBLE)) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS benford_ppm
        |  FROM t)
        |SELECT d AS digit, n, n * 1000000 DIV tot AS observed_ppm, benford_ppm,
        |  abs(n * 1000000 DIV tot - benford_ppm) AS dev_ppm
        |FROM e""".stripMargin)),

    // Time-decayed engagement features (feature-store freshness
    // weighting): per-user spend decayed by a 7-day HALF-LIFE, computed
    // as cents DIV 2^k where k = age_days DIV 7 from the corpus max day
    // — the staircase half-life form keeps every contribution EXACT
    // integer arithmetic (no exp(), whose last-ulp behavior is libm-
    // specific), so the aggregate is order-free and bit-identical in
    // both engines. One scan; the anchor day is a broadcast scalar;
    // shift amounts cap at 40 half-lives (contribution is 0 past 62
    // anyway, and the cap keeps 1<<k in BIGINT range at any age).
    "x_decayed_engagement" -> ((s, dir) => events(s, dir,
      """WITH e AS (
        |  SELECT user_id, unix_micros(ts) DIV 86400000000 AS day,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |a AS (SELECT max(day) AS anchor FROM e),
        |w AS (SELECT user_id, cents, (anchor - day) DIV 7 AS k FROM e CROSS JOIN a)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS raw_cents,
        |  CAST(sum(CASE WHEN k >= 40 THEN 0 ELSE cents DIV shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)) END) AS BIGINT) AS decayed_cents,
        |  CAST(sum(CASE WHEN k = 0 THEN cents ELSE 0 END) AS BIGINT) AS last_halflife_cents
        |FROM w GROUP BY user_id""".stripMargin))
  )

  def oracle: Map[String, String] = Map(
    "x_gap_fill" ->
      """WITH days AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS day_value
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM days GROUP BY 1),
        |grid AS (SELECT user_id, gs.day FROM span, unnest(generate_series(d0, d1)) gs(day)),
        |joined AS (
        |  SELECT g.user_id, g.day, d.day_value
        |  FROM grid g LEFT JOIN days d ON g.user_id = d.user_id AND g.day = d.day)
        |SELECT user_id, day, CAST(day_value AS DOUBLE) AS obs_value,
        |  CAST(last_value(day_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled_value
        |FROM joined""".stripMargin,

    "x_entity_resolution" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS id, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000 AS id,
        |    substr(c_name, 1, 9 + (c_custkey % 9)) || 'z' ||
        |    substr(c_name, 11 + (c_custkey % 9), 18) AS name
        |  FROM customer WHERE c_custkey % 3 = 0),
        |keys AS (
        |  SELECT id, name, gs.i AS i,
        |    substr(name, 1, gs.i - 1) || substr(name, gs.i + 1, 18) AS blk
        |  FROM dirty, (SELECT unnest(generate_series(1, 18)) AS i) gs),
        |cand AS (
        |  SELECT DISTINCT a.id AS canonical_id, b.id AS dirty_id,
        |    a.name AS an, b.name AS bn
        |  FROM keys a JOIN keys b ON a.i = b.i AND a.blk = b.blk
        |  WHERE a.id < 1000000 AND b.id >= 1000000)
        |SELECT canonical_id, dirty_id,
        |  CAST(levenshtein(an, bn) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(an, bn) <= 1""".stripMargin,

    "x_decontamination" ->
      s"""WITH w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM documents
         |           WHERE len(string_split_regex(text, '\\s+')) >= 8),
         |idx AS (SELECT doc_id, words, unnest(generate_series(1, len(words) - 7)) AS i FROM w),
         |g AS (SELECT DISTINCT doc_id,
         |  ${duckH64("array_to_string(list_slice(words, i, i + 7), ' ')")} AS gram_h FROM idx),
         |eval_g AS (SELECT DISTINCT gram_h FROM g WHERE doc_id % 97 = 0),
         |corpus AS (SELECT doc_id, gram_h FROM g WHERE doc_id % 97 != 0)
         |SELECT c.doc_id, count(*) AS n_grams, count(e.gram_h) AS n_contaminated,
         |  CAST(count(e.gram_h) AS DOUBLE) / count(*) AS contamination,
         |  CAST(count(e.gram_h) AS DOUBLE) / count(*) >= 0.25 AS flagged
         |FROM corpus c LEFT JOIN eval_g e ON e.gram_h = c.gram_h
         |GROUP BY c.doc_id""".stripMargin,

    "x_k_anonymity" ->
      """SELECT lang, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
        |  count(*) AS group_size,
        |  CAST(count(DISTINCT source) AS BIGINT) AS l_diversity,
        |  count(*) >= 10 AS k_anonymous,
        |  count(DISTINCT source) >= 3 AS l_diverse
        |FROM documents
        |GROUP BY lang, n_chars // 100""".stripMargin,

    "x_pii_redaction" ->
      s"""WITH enriched_src AS (SELECT doc_id, text FROM documents),
         |$duckEnriched,
         |r AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+')) AS n_emails,
         |    len(regexp_extract_all(text, '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS n_ips,
         |    len(regexp_extract_all(text, '555-[0-9]{4}')) AS n_phones,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+', '<EMAIL>', 'g'),
         |      '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g'),
         |      '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
         |  FROM enriched)
         |SELECT doc_id, n_emails, n_ips, n_phones,
         |  md5(redacted) AS redacted_hash,
         |  NOT regexp_matches(redacted, '@') AS clean
         |FROM r""".stripMargin,

    "x_repetition_filter" ->
      s"""WITH w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM documents
         |           WHERE len(string_split_regex(text, '\\s+')) >= 5),
         |idx AS (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i FROM w),
         |g AS (SELECT doc_id, ${duckH64("array_to_string(list_slice(words, i, i + 4), ' ')")} AS gh FROM idx),
         |gs AS (SELECT doc_id, count(*) AS n_grams, count(DISTINCT gh) AS n_distinct
         |       FROM g GROUP BY doc_id),
         |wf AS (SELECT doc_id, unnest(words) AS word FROM w),
         |wc AS (SELECT doc_id, word, count(*) AS c FROM wf GROUP BY doc_id, word),
         |tw AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS max_c, CAST(sum(c) AS BIGINT) AS n_words
         |       FROM wc GROUP BY doc_id)
         |SELECT g.doc_id, g.n_grams, g.n_distinct,
         |  1.0 - CAST(g.n_distinct AS DOUBLE) / g.n_grams AS dup_ratio,
         |  CAST(t.max_c AS DOUBLE) / t.n_words AS top_word_share,
         |  (1.0 - CAST(g.n_distinct AS DOUBLE) / g.n_grams) <= 0.5
         |    AND CAST(t.max_c AS DOUBLE) / t.n_words <= 0.2 AS keep
         |FROM gs g JOIN tw t ON t.doc_id = g.doc_id""".stripMargin,

    "x_train_test_split" ->
      s"""WITH a AS (
         |  SELECT doc_id, lang, n_chars,
         |    CASE WHEN ${duckH64("doc_id::VARCHAR")} % 100 < 90 THEN 'train'
         |         WHEN ${duckH64("doc_id::VARCHAR")} % 100 < 95 THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM a GROUP BY split, lang""".stripMargin,

    "x_incremental_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type""".stripMargin,

    "x_funnel_analysis" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM events e
        |       JOIN s3 ON s3.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY e.user_id)
        |SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
        |UNION ALL SELECT '2_view', count(*) FROM s2
        |UNION ALL SELECT '3_click', count(*) FROM s3
        |UNION ALL SELECT '4_purchase', count(*) FROM s4""".stripMargin,

    "x_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS next_t,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
        |  FROM events),
        |pairs AS (
        |  SELECT prev_t, next_t, count(*) AS n
        |  FROM seq WHERE prev_t IS NOT NULL GROUP BY prev_t, next_t)
        |SELECT prev_t, next_t, CAST(n AS BIGINT) AS n,
        |  CAST(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_t) AS DOUBLE) AS DOUBLE) AS p_next
        |FROM pairs""".stripMargin,

    "x_distribution_drift" ->
      """WITH j AS (
        |  SELECT event_type, event_id % 2 AS half,
        |    CAST(least(floor(value / 10), 9) AS BIGINT) AS b
        |  FROM events WHERE value IS NOT NULL),
        |t AS (SELECT event_type, half, count(*) AS tot FROM j GROUP BY event_type, half),
        |c AS (SELECT event_type, half, b, count(*) AS c FROM j GROUP BY event_type, half, b),
        |sh AS (SELECT c.event_type, c.b, c.half, (1000 * c.c) // t.tot AS share
        |       FROM c JOIN t ON t.event_type = c.event_type AND t.half = c.half),
        |p AS (SELECT event_type, b,
        |    sum(CASE WHEN half = 0 THEN share ELSE 0 END) AS s0,
        |    sum(CASE WHEN half = 1 THEN share ELSE 0 END) AS s1
        |  FROM sh GROUP BY event_type, b)
        |SELECT event_type,
        |  CAST(sum(abs(s0 - s1)) // 2 AS BIGINT) AS tvd_permille,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(max(abs(s0 - s1)) AS BIGINT) AS worst_bucket_permille
        |FROM p GROUP BY event_type""".stripMargin,

    "x_scd2_history" ->
      """WITH s AS (
        |  SELECT user_id, event_type AS state, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |chg AS (
        |  SELECT user_id, state, ts, event_id FROM s
        |  WHERE prev IS NULL OR state != prev)
        |SELECT user_id, state,
        |  epoch_ms(ts) AS valid_from_ms,
        |  epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_ms,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM chg""".stripMargin,

    "x_retention_cohorts" ->
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events)
        |SELECT f.cohort, date_diff('day', f.cohort, a.wk) // 7 AS week_offset,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM a JOIN f ON f.user_id = a.user_id
        |GROUP BY f.cohort, date_diff('day', f.cohort, a.wk) // 7""".stripMargin,

    "x_attribution" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch
        |  FROM events),
        |conv AS (SELECT * FROM seq WHERE event_type = 'purchase' AND last_touch IS NOT NULL)
        |SELECT CASE WHEN grouping(last_touch) = 0 THEN 'last_touch' ELSE 'first_touch' END AS model,
        |  coalesce(last_touch, first_touch) AS channel,
        |  CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |FROM conv
        |GROUP BY GROUPING SETS ((last_touch), (first_touch))""".stripMargin,

    "x_rfm_segmentation" ->
      """WITH u AS (
        |  SELECT user_id,
        |    ((SELECT max(epoch_us(ts)) FROM events) - max(epoch_us(ts))) // 3600000000 AS rec,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mon
        |  FROM events GROUP BY user_id),
        |ub AS (SELECT user_id, rec, freq, mon, mon // 10000 AS mb FROM u),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ub),
        |rdist AS (
        |  SELECT v, coalesce(sum(c) OVER (ORDER BY v DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
        |  FROM (SELECT rec AS v, count(*) AS c FROM ub GROUP BY rec) g1),
        |fdist AS (
        |  SELECT v, coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM (SELECT freq AS v, count(*) AS c FROM ub GROUP BY freq) g2),
        |mdist AS (
        |  SELECT v, coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM (SELECT mb AS v, count(*) AS c FROM ub GROUP BY mb) g3)
        |SELECT ub.user_id, CAST(ub.rec AS BIGINT) AS recency_hours,
        |  ub.freq AS frequency, ub.mon AS monetary_cents,
        |  CAST(rdist.above * 5 // n.n + 1 AS BIGINT) AS r_score,
        |  CAST(fdist.below * 5 // n.n + 1 AS BIGINT) AS f_score,
        |  CAST(mdist.below * 5 // n.n + 1 AS BIGINT) AS m_score
        |FROM ub CROSS JOIN n
        |JOIN rdist ON rdist.v = ub.rec
        |JOIN fdist ON fdist.v = ub.freq
        |JOIN mdist ON mdist.v = ub.mb""".stripMargin,

    "x_ab_test" ->
      s"""WITH assign AS (
         |  SELECT user_id, ${TextQueries.duckH64("user_id::VARCHAR")} % 2 AS variant
         |  FROM (SELECT DISTINCT user_id FROM events) du),
         |conv AS (SELECT DISTINCT user_id FROM events
         |         WHERE event_type = 'purchase' AND CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 20000),
         |v AS (
         |  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
         |    CAST(count(conv.user_id) AS BIGINT) AS n_conv
         |  FROM assign LEFT JOIN conv ON conv.user_id = assign.user_id
         |  GROUP BY variant),
         |ab AS (
         |  SELECT
         |    max(CASE WHEN variant = 0 THEN n_users END) AS n_a,
         |    max(CASE WHEN variant = 0 THEN n_conv END) AS c_a,
         |    max(CASE WHEN variant = 1 THEN n_users END) AS n_b,
         |    max(CASE WHEN variant = 1 THEN n_conv END) AS c_b
         |  FROM v)
         |SELECT n_a, c_a, n_b, c_b,
         |  c_a * 1000 // n_a AS cr_a_permille,
         |  c_b * 1000 // n_b AS cr_b_permille,
         |  CAST(FLOOR((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         |    / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) * (CAST(1 AS DOUBLE) - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
         |      * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE))) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS z_micro
         |FROM ab""".stripMargin,

    "x_ab_cuped" ->
      s"""WITH b AS (
         |  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
         |per_user AS (
         |  SELECT user_id, ${TextQueries.duckH64("user_id::VARCHAR")} % 2 AS variant,
         |    CAST(SUM(CASE WHEN epoch_us(ts) * 2 < (SELECT lo + hi FROM b) THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         |    CAST(SUM(CASE WHEN epoch_us(ts) * 2 >= (SELECT lo + hi FROM b) THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
         |  FROM events GROUP BY user_id),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(y * y) AS BIGINT) AS syy,
         |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
         |    CAST(SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
         |    CAST(SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b
         |  FROM per_user)
         |SELECT n_a, n_b,
         |  CAST(FLOOR((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)) * CAST(1000 AS DOUBLE)) AS BIGINT) AS diff_raw_millicents,
         |  CAST(FLOOR(((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         |    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
         |      * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))) * CAST(1000 AS DOUBLE)) AS BIGINT) AS diff_cuped_millicents,
         |  CAST(FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS theta_micro,
         |  CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * CAST(1000 AS DOUBLE)) AS BIGINT) AS var_reduction_permille
         |FROM m""".stripMargin,

    "x_funnel_windowed" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 72 HOUR GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 72 HOUR GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM events e
        |       JOIN s3 ON s3.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s3.t3 AND e.ts <= s3.t3 + INTERVAL 72 HOUR GROUP BY e.user_id)
        |SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
        |UNION ALL SELECT '2_view_72h', CAST(count(*) AS BIGINT) FROM s2
        |UNION ALL SELECT '3_click_72h', CAST(count(*) AS BIGINT) FROM s3
        |UNION ALL SELECT '4_purchase_72h', CAST(count(*) AS BIGINT) FROM s4""".stripMargin,

    "x_seasonality" ->
      """WITH e AS (
        |  SELECT event_type, isodow(ts) AS dow, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |d AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
        |      FROM e GROUP BY event_type, dow),
        |t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts FROM d GROUP BY event_type)
        |SELECT d.event_type AS event_type, CAST(d.dow AS BIGINT) AS dow, d.n,
        |  d.s * 1000 // d.n AS mean_millicents,
        |  (d.s * t.tn * 1000) // (t.ts * d.n) AS vs_type_mean_permille
        |FROM d JOIN t ON t.event_type = d.event_type""".stripMargin,

    "x_cohort_ltv" ->
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |           FROM events GROUP BY user_id),
        |cs AS (SELECT f.cohort, CAST(count(*) AS BIGINT) AS cohort_users FROM f GROUP BY f.cohort),
        |rev AS (
        |  SELECT f.cohort, date_diff('day', f.cohort, CAST(e.ts AS DATE)) // 7 AS wk,
        |    CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents
        |  FROM events e JOIN f ON f.user_id = e.user_id
        |  GROUP BY f.cohort, date_diff('day', f.cohort, CAST(e.ts AS DATE)) // 7),
        |cum AS (
        |  SELECT cohort, wk, sum(cents) OVER (PARTITION BY cohort ORDER BY wk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
        |  FROM rev)
        |SELECT cum.cohort AS cohort, CAST(cum.wk AS BIGINT) AS week_offset,
        |  CAST(cum.cum_cents AS BIGINT) AS cum_cents,
        |  CAST(cum.cum_cents * 1000 // cs.cohort_users AS BIGINT) AS ltv_millicents_per_user
        |FROM cum JOIN cs ON cs.cohort = cum.cohort""".stripMargin,

    "x_sankey_paths" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events),
        |paths AS (
        |  SELECT e1 || '>' || e2 || '>' || e3 AS path, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE e3 IS NOT NULL GROUP BY e1 || '>' || e2 || '>' || e3),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM paths)
        |SELECT p.path, p.n, p.n * 1000000 // tot.t AS share_ppm,
        |  row_number() OVER (ORDER BY p.n DESC, p.path) AS pos
        |FROM paths p CROSS JOIN tot
        |ORDER BY p.n DESC, p.path LIMIT 20""".stripMargin,

    "x_power_analysis" ->
      s"""WITH assign AS (
         |  SELECT user_id, ${TextQueries.duckH64("user_id::VARCHAR")} % 2 AS variant
         |  FROM (SELECT DISTINCT user_id FROM events) du),
         |conv AS (SELECT DISTINCT user_id FROM events
         |         WHERE event_type = 'purchase' AND CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 20000),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(conv.user_id) AS BIGINT) AS c
         |      FROM assign LEFT JOIN conv ON conv.user_id = assign.user_id)
         |SELECT n AS n_users, c AS n_conv, c * 1000 // n AS baseline_permille,
         |  CAST(FLOOR((CAST(196 AS DOUBLE) / CAST(100 AS DOUBLE) + CAST(84 AS DOUBLE) / CAST(100 AS DOUBLE))
         |    * sqrt(CAST(2 AS DOUBLE) * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(1 AS DOUBLE) - CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) / CAST(2 AS DOUBLE)))
         |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS mde_abs_micro
         |FROM m""".stripMargin,

    "x_changepoint" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd, CAST(SUM(s) AS BIGINT) AS tot FROM d GROUP BY event_type),
        |c AS (
        |  SELECT d.event_type, d.day,
        |    CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS idx,
        |    CAST(sum(d.s) OVER (PARTITION BY d.event_type ORDER BY d.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM d),
        |dev AS (
        |  SELECT c.event_type, c.day, abs(c.cum * t.nd - c.idx * t.tot) AS raw_dev,
        |    abs(c.cum * t.nd - c.idx * t.tot) * 1000 // (t.nd * t.tot) AS dev_permille
        |  FROM c JOIN t ON t.event_type = c.event_type),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY raw_dev DESC, day) AS rn FROM dev)
        |SELECT event_type, CAST(day AS BIGINT) AS changepoint_day, CAST(dev_permille AS BIGINT) AS dev_permille
        |FROM rk WHERE rn = 1""".stripMargin,

    "x_growth_accounting" ->
      """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |s AS (SELECT user_id, day, lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
        |             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt FROM a),
        |st AS (
        |  SELECT day, CASE WHEN prev IS NULL THEN 'new' WHEN day = prev + 1 THEN 'retained' ELSE 'resurrected' END AS cat
        |  FROM s
        |  UNION ALL
        |  SELECT day + 1 AS day, 'churned' AS cat FROM s
        |  WHERE (nxt IS NULL OR nxt > day + 1) AND day + 1 <= (SELECT max(epoch_us(ts) // 86400000000) FROM events))
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(SUM(CASE WHEN cat = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN cat = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(SUM(CASE WHEN cat = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        |  CAST(SUM(CASE WHEN cat = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
        |FROM st GROUP BY day""".stripMargin,

    "x_rolling_actives" ->
      """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |sup AS (SELECT user_id, day + unnest(range(0, 7)) AS wday, unnest(range(0, 7)) AS i FROM a),
        |g AS (SELECT wday, count(DISTINCT user_id) AS wau,
        |             count(DISTINCT CASE WHEN i = 0 THEN user_id END) AS dau
        |      FROM sup GROUP BY wday)
        |SELECT CAST(wday AS BIGINT) AS day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
        |  CAST(dau * 1000 // wau AS BIGINT) AS stickiness_permille
        |FROM g WHERE wday <= (SELECT max(epoch_us(ts) // 86400000000) FROM events)""".stripMargin,

    "x_conversion_lag" ->
      """WITH su AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |pu AS (SELECT e.user_id, min(su.t1) AS t1, min(e.ts) AS t2
        |       FROM events e JOIN su ON su.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > su.t1 GROUP BY e.user_id),
        |lg AS (SELECT (epoch_us(t2) - epoch_us(t1)) // 3600000000 AS v FROM pu),
        |h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM lg GROUP BY v),
        |cum AS (SELECT v, c,
        |    CAST(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cend,
        |    CAST(SUM(c) OVER () AS BIGINT) AS n
        |  FROM h)
        |SELECT CAST(p AS BIGINT) AS p, CAST(v AS BIGINT) AS lag_hours, n AS n_converters
        |FROM cum CROSS JOIN (SELECT unnest([50, 90, 99]) AS p) ps
        |WHERE cend >= ((n - 1) * p) // 100 + 1 AND cend - c < ((n - 1) * p) // 100 + 1""".stripMargin,

    "x_robust_stats" ->
      """WITH c AS (SELECT event_type AS g, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 100 AS v FROM events),
        |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |      count(*) OVER (PARTITION BY g) AS n FROM c),
        |med AS (SELECT g, v AS med, n FROM r WHERE rn = ((n - 1) * 50) // 100 + 1),
        |dev AS (SELECT c.g, abs(c.v - med.med) AS dv, med.med, med.n FROM c JOIN med ON med.g = c.g),
        |r2 AS (SELECT g, dv, med, n, row_number() OVER (PARTITION BY g ORDER BY dv) AS rn FROM dev)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CAST(med AS BIGINT) AS median_dollars, CAST(dv AS BIGINT) AS mad_dollars
        |FROM r2 WHERE rn = ((n - 1) * 50) // 100 + 1""".stripMargin,

    "x_winsorized" ->
      """WITH c AS (SELECT event_type AS g, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 100 AS v FROM events),
        |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |      count(*) OVER (PARTITION BY g) AS n FROM c),
        |qs AS (SELECT g, max(n) AS n,
        |    max(CASE WHEN rn = ((n - 1) * 5) // 100 + 1 THEN v END) AS p5,
        |    max(CASE WHEN rn = ((n - 1) * 95) // 100 + 1 THEN v END) AS p95,
        |    max(CASE WHEN rn = ((n - 1) * 25) // 100 + 1 THEN v END) AS q1,
        |    max(CASE WHEN rn = ((n - 1) * 75) // 100 + 1 THEN v END) AS q3
        |  FROM r GROUP BY g)
        |SELECT c.g AS event_type, CAST(qs.n AS BIGINT) AS n,
        |  CAST(qs.q1 AS BIGINT) AS q1_dollars, CAST(qs.q3 AS BIGINT) AS q3_dollars,
        |  CAST(SUM(least(greatest(c.v, qs.p5), qs.p95)) * 1000 // qs.n AS BIGINT) AS winsorized_mean_millidollars,
        |  CAST(SUM(CASE WHEN 2 * c.v < 2 * qs.q1 - 3 * (qs.q3 - qs.q1) OR 2 * c.v > 2 * qs.q3 + 3 * (qs.q3 - qs.q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(SUM(CASE WHEN 2 * c.v < 2 * qs.q1 - 3 * (qs.q3 - qs.q1) OR 2 * c.v > 2 * qs.q3 + 3 * (qs.q3 - qs.q1) THEN 1 ELSE 0 END) * 1000000 // qs.n AS BIGINT) AS outlier_ppm
        |FROM c JOIN qs ON qs.g = c.g
        |GROUP BY c.g, qs.n, qs.q1, qs.q3""".stripMargin,

    "x_ks_test" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
        |e AS (
        |  SELECT CASE WHEN epoch_us(ts) * 2 < (SELECT lo + hi FROM b) THEN 0 ELSE 1 END AS half,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 100 AS dollars
        |  FROM events WHERE event_type = 'purchase'),
        |d AS (SELECT half, dollars, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY half, dollars),
        |g AS (SELECT dollars,
        |    CAST(SUM(CASE WHEN half = 0 THEN c ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN half = 1 THEN c ELSE 0 END) AS BIGINT) AS c1
        |  FROM d GROUP BY dollars),
        |cum AS (
        |  SELECT dollars,
        |    CAST(SUM(c0) OVER (ORDER BY dollars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f0,
        |    CAST(SUM(c1) OVER (ORDER BY dollars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
        |    CAST(SUM(c0) OVER () AS BIGINT) AS n0, CAST(SUM(c1) OVER () AS BIGINT) AS n1
        |  FROM g),
        |ks AS (SELECT dollars, abs(f0 * n1 - f1 * n0) AS dev, n0, n1 FROM cum),
        |mx AS (SELECT * FROM ks ORDER BY dev DESC, dollars LIMIT 1)
        |SELECT n0 AS n_first, n1 AS n_second, dollars AS ks_at_dollars,
        |  dev * 1000 // (n0 * n1) AS ks_permille,
        |  CAST(FLOOR(sqrt((CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
        |    * (CAST(dev AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))) * CAST(1000 AS DOUBLE)) AS BIGINT) AS ks_stat_milli
        |FROM mx""".stripMargin,

    "x_benford" ->
      """WITH c AS (
        |  SELECT CAST(substring(CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
        |  FROM events WHERE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 1),
        |f AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY d),
        |t AS (SELECT d, n, CAST(SUM(n) OVER () AS BIGINT) AS tot FROM f),
        |e AS (SELECT d, n, tot,
        |    CAST(FLOOR(ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(d AS DOUBLE)) / ln(CAST(10 AS DOUBLE)) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS benford_ppm
        |  FROM t)
        |SELECT d AS digit, n, n * 1000000 // tot AS observed_ppm, benford_ppm,
        |  abs(n * 1000000 // tot - benford_ppm) AS dev_ppm
        |FROM e""".stripMargin,

    "x_decayed_engagement" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |a AS (SELECT max(day) AS anchor FROM e),
        |w AS (SELECT user_id, cents, (anchor - day) // 7 AS k FROM e CROSS JOIN a)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS raw_cents,
        |  CAST(sum(CASE WHEN k >= 40 THEN 0 ELSE cents // (CAST(1 AS BIGINT) << k) END) AS BIGINT) AS decayed_cents,
        |  CAST(sum(CASE WHEN k = 0 THEN cents ELSE 0 END) AS BIGINT) AS last_halflife_cents
        |FROM w GROUP BY user_id""".stripMargin
  )
}
