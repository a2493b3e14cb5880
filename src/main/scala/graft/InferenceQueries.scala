package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statistical-inference and distributed-linear-algebra operators: the
  * Poisson bootstrap (THE resampling scheme that distributes — each row
  * draws its replica weights independently, so no replica ever needs a
  * shuffled copy of the data), per-source corpus-divergence diagnostics,
  * out-of-fold target encoding (the leakage-safe feature-engineering
  * primitive), and exact Gram-matrix / power-iteration PCA over the
  * embedding table (reference scope: the aggregation surface of
  * sanpshot_script.py re-expressed for model-eval pipelines).
  *
  * Cross-engine determinism follows the StatsQueries discipline: exact
  * integer moments, integer division (Spark `DIV` = DuckDB `//`, both
  * truncate toward zero), the shared md5-based [[TextQueries.h64]] for
  * every pseudo-random draw, and — where a statistic genuinely needs a
  * transcendental (the JSD's ln) — per-term quantization to integer
  * units BEFORE the sum, so no floating accumulation order can differ
  * between engines (the x_benford idiom).
  *
  * Scale notes (the 100 TB shapes):
  *  - bootstrap: replica weights are a pure row-local hash function, so
  *    the expansion is a generator column + map-side-combinable hash agg
  *    with R groups — the shuffle is R rows per task, never R copies of
  *    the data.
  *  - JSD: the p=0 tail (corpus terms absent from a source) is summed in
  *    CLOSED FORM (ln2 · (1 − Q_s)), so the join touches only terms the
  *    source actually contains — never |sources| × |vocabulary|.
  *  - Gram matrix: double posexplode + hash agg on (i,j) — each task
  *    emits at most d(d+1)/2 partial sums regardless of row count, so
  *    the shuffle is O(d²·tasks), not O(n·d²).
  *  - power iteration: 64-row × 4096-row joins after the one data pass;
  *    max-norm rescaling in pure integer arithmetic keeps every
  *    intermediate within int64 at any corpus size.
  *
  * The Spark-side SQL lives in named constants so `InferenceQueriesSpec`
  * can run the identical text against hand-built frames with known
  * closed-form answers.
  */
object InferenceQueries extends QueryPack {

  import TextQueries.{h64, duckH64}

  private def events(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "events").createOrReplaceTempView("events")
    s.sql(sql)
  }

  private def docs(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql(sql)
  }

  private def embs(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
    s.sql(sql)
  }

  /** Poisson(1) inverse-CDF thresholds in millionths: a hash-uniform
    * u ∈ [0, 1e6) maps to the replica weight via cumulative-probability
    * cutoffs (computed once from exp(-1); identical literals in both
    * engines). P(w > 9) < 3e-7 — truncation is the standard bootstrap
    * tail cut and applies identically to both engines.
    */
  private def poissonOf(u: String): String =
    s"""CASE WHEN ($u) < 367879 THEN 0 WHEN ($u) < 735758 THEN 1
       | WHEN ($u) < 919698 THEN 2 WHEN ($u) < 981011 THEN 3
       | WHEN ($u) < 996340 THEN 4 WHEN ($u) < 999405 THEN 5
       | WHEN ($u) < 999916 THEN 6 WHEN ($u) < 999989 THEN 7
       | WHEN ($u) < 999998 THEN 8 ELSE 9 END""".stripMargin.replace("\n", "")

  // Replica count: 200 gives rank-5 / rank-196 as the exact 2.5% / 97.5%
  // order statistics. The per-replica plan is ONE hash aggregate with R
  // groups — R scales the shuffle by R rows/task, not by data volume.
  private val R = 200

  /** Poisson bootstrap 95% CI for mean per-user revenue: each (user,
    * replica) pair draws w ~ Poisson(1) from the shared deterministic
    * hash, replica means are exact integer cents, and the CI bounds are
    * the 5th and 196th order statistics of the 200 replica means. The
    * weights being row-local is the whole point: at 100 TB no replica
    * ever materializes a resampled copy — the expansion is a generator
    * cross join feeding a 200-group map-combinable aggregate.
    */
  /** The one events pass both bootstrap rows share: per-user revenue in
    * exact cents. Registered once per (session, sfDir) as the `bs_u`
    * cacheView — x_bootstrap_ci and x_bootstrap_median each previously
    * re-scanned and re-aggregated the events table per invocation to
    * rebuild this identical frame; everything past it is bounded by
    * users × replicas, not by event volume.
    */
  private[graft] val bootstrapUserSql: String =
    """SELECT user_id,
      |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
      |FROM events GROUP BY user_id""".stripMargin

  private[graft] val bootstrapSql: String =
    s"""WITH u AS (SELECT user_id, x FROM bs_u),
       |reps AS (SELECT explode(sequence(-1, ${R - 1})) AS r),
       |w0 AS (
       |  SELECT reps.r, u.x,
       |    CASE WHEN reps.r = -1 THEN -1 ELSE
       |      ${h64(s"concat('bs', CAST(reps.r AS STRING), '_', CAST(u.user_id AS STRING))")} % 1000000
       |    END AS uu
       |  FROM u CROSS JOIN reps),
       |w AS (
       |  SELECT r, x,
       |    CASE WHEN uu = -1 THEN 1 ELSE (${poissonOf("uu")}) END AS wt
       |  FROM w0),
       |m AS (
       |  SELECT r, CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(SUM(wt * x) DIV NULLIF(SUM(wt), 0) AS BIGINT) AS mean_cents
       |  FROM w GROUP BY r),
       |rk AS (SELECT r, n_users, mean_cents,
       |  row_number() OVER (PARTITION BY CASE WHEN r = -1 THEN 0 ELSE 1 END
       |    ORDER BY mean_cents, r) AS rn,
       |  count(*) OVER (PARTITION BY CASE WHEN r = -1 THEN 0 ELSE 1 END) AS m
       |  FROM m WHERE mean_cents IS NOT NULL)
       |SELECT
       |  CAST(MAX(CASE WHEN r = -1 THEN n_users END) AS BIGINT) AS n_users,
       |  CAST(MAX(CASE WHEN r = -1 THEN mean_cents END) AS BIGINT) AS point_mean_cents,
       |  CAST(MAX(CASE WHEN r >= 0 AND rn = GREATEST(1, m * 25 DIV 1000)
       |    THEN mean_cents END) AS BIGINT) AS ci_lo_cents,
       |  CAST(MAX(CASE WHEN r >= 0 AND rn = m + 1 - GREATEST(1, m * 25 DIV 1000)
       |    THEN mean_cents END) AS BIGINT) AS ci_hi_cents
       |FROM rk""".stripMargin

  /** Jensen-Shannon divergence of every source's term distribution from
    * the whole corpus — "which slice is most atypical", the mixture-
    * curation diagnostic. Per-term contributions are exact-integer
    * ratios fed to ln and quantized to nano-units BEFORE summation; the
    * p=0 tail (corpus terms the source lacks) collapses to
    * ln2 · (1 − Q_s), so the join is bounded by the source's own terms.
    */
  /** The one documents pass behind [[jsDivergenceRankSql]]: per-(source,
    * term) counts — materialized once (localCheckpoint) because the
    * divergence stage references it four times and Spark inlines CTEs.
    * The table is vocabulary × sources, corpus-independent in width.
    */
  private[graft] val jsTermCountsSql: String =
    """SELECT source, word, count(*) AS c
      |FROM documents LATERAL VIEW explode(split(lower(text), '\\s+')) x AS word
      |WHERE length(word) >= 2
      |GROUP BY source, word""".stripMargin

  private[graft] val jsDivergenceRankSql: String =
    """WITH st AS (SELECT * FROM js_st),
      |sn AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM st GROUP BY source),
      |ct AS (SELECT word, CAST(SUM(c) AS BIGINT) AS cc FROM st GROUP BY word),
      |cn AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM ct),
      |terms AS (
      |  SELECT st.source,
      |    CAST(FLOOR((
      |      (CAST(st.c AS DOUBLE) / CAST(sn.ns AS DOUBLE))
      |        * ln(CAST(2 * st.c * cn.n AS DOUBLE) / CAST(st.c * cn.n + ct.cc * sn.ns AS DOUBLE))
      |      + (CAST(ct.cc AS DOUBLE) / CAST(cn.n AS DOUBLE))
      |        * ln(CAST(2 * ct.cc * sn.ns AS DOUBLE) / CAST(st.c * cn.n + ct.cc * sn.ns AS DOUBLE))
      |    ) * 1000000000) AS BIGINT) AS nano,
      |    ct.cc AS cc
      |  FROM st JOIN sn ON sn.source = st.source
      |          JOIN ct ON ct.word = st.word CROSS JOIN cn),
      |agg AS (
      |  SELECT source, CAST(SUM(nano) AS BIGINT) AS in_nano,
      |    CAST(SUM(cc) AS BIGINT) AS covered
      |  FROM terms GROUP BY source)
      |SELECT agg.source,
      |  CAST((agg.in_nano
      |    + CAST(FLOOR(ln(CAST(2 AS DOUBLE))
      |        * (CAST(1000000000 AS DOUBLE)
      |           - CAST(1000000000 * agg.covered DIV cn.n AS DOUBLE))) AS BIGINT)
      |  ) DIV 2000 AS BIGINT) AS jsd_micro
      |FROM agg CROSS JOIN cn""".stripMargin

  /** Out-of-fold target encoding: entity-level (user-hash) 5-fold
    * assignment, then each (event_type, fold) cell gets the mean value
    * computed from the OTHER four folds via total-minus-fold — the
    * leakage-safe encoding plan that needs exactly one aggregate pass
    * however many folds there are.
    */
  private[graft] val targetEncodingSql: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |    ${h64("concat('kf_', CAST(user_id AS STRING))")} % 5 AS fold,
       |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
       |  FROM events),
       |f AS (
       |  SELECT event_type, fold, CAST(SUM(cents) AS BIGINT) AS sc,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM e GROUP BY event_type, fold)
       |SELECT event_type, CAST(fold AS BIGINT) AS fold, n AS fold_rows,
       |  CAST((SUM(sc) OVER (PARTITION BY event_type) - sc)
       |    DIV NULLIF(SUM(n) OVER (PARTITION BY event_type) - n, 0) AS BIGINT) AS oof_mean_cents
       |FROM f""".stripMargin

  /** Exact Gram/scatter matrix of the embedding table (upper triangle):
    * values quantize to micro-units once, then every product and sum is
    * exact int64. The double posexplode keeps the whole computation in
    * one scan — each task pre-aggregates to ≤ d(d+1)/2 = 2080 cells, so
    * the shuffle is O(d²) per task regardless of row count. This is the
    * PCA/whitening front half at any scale.
    */
  private[graft] val gramMatrixSql: String =
    """WITH q AS (
      |  SELECT transform(embedding,
      |    e -> CAST(FLOOR(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings),
      |x AS (
      |  SELECT i, j, qi * qj AS p
      |  FROM q
      |  LATERAL VIEW posexplode(qv) a AS i, qi
      |  LATERAL VIEW posexplode(qv) b AS j, qj
      |  WHERE i <= j)
      |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
      |  CAST(SUM(p) AS BIGINT) AS s
      |FROM x GROUP BY i, j""".stripMargin

  /** Dominant eigenvector of the Gram matrix by three power iterations
    * in pure integer arithmetic: the matrix and vector rescale by
    * max-abs (integer division) every round, so intermediates stay
    * within int64 at ANY corpus size and both engines walk the
    * identical lattice. One data pass builds the matrix; the iterations
    * are 64-row × 4096-row joins — driver-free, broadcast-sized.
    */
  /** The ONE embeddings pass both PCA queries share: the micro-quantized
    * Gram matrix (d² rows whatever the corpus size). Materialized once
    * per (session, scale factor) behind the `pca_g` cached view — as a
    * plain CTE prefix, Catalyst's CTE inlining re-ran this corpus pass
    * per downstream reference (~5 scans per query, r14 leaf census).
    */
  private[graft] val gramStageSql: String =
    """WITH q AS (
      |  SELECT transform(embedding,
      |    e -> CAST(FLOOR(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings),
      |x AS (
      |  SELECT i, j, qi * qj AS p
      |  FROM q
      |  LATERAL VIEW posexplode(qv) a AS i, qi
      |  LATERAL VIEW posexplode(qv) b AS j, qj)
      |SELECT i, j, CAST(SUM(p) AS BIGINT) AS s FROM x GROUP BY i, j""".stripMargin

  /** Register the cached Gram view and run `sql` over it — the board
    * queries and the specs share this path.
    */
  private[graft] def overGram(s: SparkSession, sql: String): DataFrame = {
    Tables.cacheView("pca_g", s.sql(gramStageSql))
    s.sql(sql)
  }

  private[graft] val pcaPowerSql: String =
    """WITH g AS (SELECT i, j, s FROM pca_g),
      |gm AS (SELECT CAST(MAX(ABS(s)) AS BIGINT) AS m FROM g),
      |c AS (SELECT i, j, s DIV ((SELECT m FROM gm) DIV 1000000 + 1) AS cn FROM g),
      |v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM c),
      |w1 AS (SELECT c.i, CAST(SUM(c.cn * v0.v) AS BIGINT) AS w
      |  FROM c JOIN v0 ON v0.i = c.j GROUP BY c.i),
      |v1 AS (SELECT i, w DIV ((SELECT MAX(ABS(w)) FROM w1) DIV 1000000 + 1) AS v FROM w1),
      |w2 AS (SELECT c.i, CAST(SUM(c.cn * v1.v) AS BIGINT) AS w
      |  FROM c JOIN v1 ON v1.i = c.j GROUP BY c.i),
      |v2 AS (SELECT i, w DIV ((SELECT MAX(ABS(w)) FROM w2) DIV 1000000 + 1) AS v FROM w2),
      |w3 AS (SELECT c.i, CAST(SUM(c.cn * v2.v) AS BIGINT) AS w
      |  FROM c JOIN v2 ON v2.i = c.j GROUP BY c.i)
      |SELECT CAST(i AS BIGINT) AS i,
      |  CAST(w DIV ((SELECT MAX(ABS(w)) FROM w3) DIV 1000000 + 1) AS BIGINT) AS v_micro
      |FROM w3""".stripMargin

  /** One-way ANOVA F over event types: between/within sums of squares
    * from exact integer moments (n, Σcents, Σcents²); the one genuinely
    * non-integer term (S_g²/n_g) is a single IEEE multiply-divide chain
    * per GROUP quantized to milli-units before the k-row sum, so no
    * accumulation order exists to differ. The final F is one double
    * division of exact integers — identical in both engines, and
    * check.py's 9dp rounding guards the last ulp.
    */
  private[graft] val anovaSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(SUM(cents) AS BIGINT) AS sg,
      |    CAST(SUM(cents * cents) AS BIGINT) AS qg
      |  FROM e GROUP BY event_type),
      |q AS (
      |  SELECT event_type, n, sg, qg,
      |    CAST(FLOOR(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
      |      / CAST(n AS DOUBLE) * 1000) AS BIGINT) AS sq_milli
      |  FROM g),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
      |    CAST(SUM(sg) AS BIGINT) AS s, CAST(SUM(qg) AS BIGINT) AS qq,
      |    CAST(SUM(sq_milli) AS BIGINT) AS sqm
      |  FROM q)
      |SELECT k AS n_groups, nn AS n_rows,
      |  CAST(sqm - CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |    / CAST(nn AS DOUBLE) * 1000) AS BIGINT) AS BIGINT) AS ssb_milli,
      |  CAST(qq * 1000 - sqm AS BIGINT) AS ssw_milli,
      |  CAST(
      |    (CAST(sqm - CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |       / CAST(nn AS DOUBLE) * 1000) AS BIGINT) AS DOUBLE) / CAST(k - 1 AS DOUBLE))
      |    / (CAST(qq * 1000 - sqm AS DOUBLE) / CAST(nn - k AS DOUBLE))
      |  AS DOUBLE) AS f_stat
      |FROM t""".stripMargin

  /** Randomization test for the purchase-vs-click mean-value gap: each
    * replica reassigns every row a pseudo-label by the shared hash
    * (proportions preserved in expectation — the binomial null), and the
    * p-value is the fraction of replicas whose absolute mean gap reaches
    * the observed one. Like the bootstrap, labels are row-local hash
    * draws: no shuffled permutation ever materializes, and the whole
    * null distribution is one R-group map-combinable aggregate.
    */
  private[graft] val permutationTestSql: String =
    s"""WITH e AS (
       |  SELECT event_id, event_type,
       |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
       |  FROM events WHERE event_type IN ('purchase', 'click')),
       |cnt AS (
       |  SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |    CAST(count(*) AS BIGINT) AS nt
       |  FROM e),
       |reps AS (SELECT explode(sequence(-1, ${R - 1})) AS r),
       |lab AS (
       |  SELECT reps.r, e.cents,
       |    CASE WHEN reps.r = -1 THEN (CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
       |      WHEN ${h64(s"concat('pm', CAST(reps.r AS STRING), '_', CAST(e.event_id AS STRING))")} % cnt.nt < cnt.na
       |      THEN 1 ELSE 0 END AS la
       |  FROM e CROSS JOIN cnt CROSS JOIN reps),
       |d AS (
       |  SELECT r, CAST(SUM(la) AS BIGINT) AS na,
       |    CAST(SUM(1 - la) AS BIGINT) AS nb,
       |    SUM(la * cents) * 1000000 DIV NULLIF(SUM(la), 0)
       |      - SUM((1 - la) * cents) * 1000000 DIV NULLIF(SUM(1 - la), 0) AS dr
       |  FROM lab GROUP BY r),
       |z AS (SELECT r, na, nb, dr,
       |  MAX(CASE WHEN r = -1 THEN dr END) OVER () AS dobs FROM d)
       |SELECT
       |  CAST(MAX(CASE WHEN r = -1 THEN na END) AS BIGINT) AS n_purchase,
       |  CAST(MAX(CASE WHEN r = -1 THEN nb END) AS BIGINT) AS n_click,
       |  CAST(MAX(CASE WHEN r = -1 THEN dr END) AS BIGINT) AS d_obs_microcents,
       |  CAST(1000 * SUM(CASE WHEN r >= 0 AND ABS(dr) >= ABS(dobs) THEN 1 ELSE 0 END)
       |    DIV ${R} AS BIGINT) AS p_permille
       |FROM z""".stripMargin

  /** Two-feature OLS (value on hour-of-day and day-of-week, both offset-
    * centered) by the centered normal equations: every moment is an exact
    * int64 sum from ONE aggregate pass; the 2×2 Cramer determinants run
    * in DECIMAL(38,0) (they exceed int64 at 100 TB row counts but not
    * decimal128), and only the final beta divisions leave exact
    * arithmetic — as single IEEE divides. The intercept-free centered
    * system never forms a 3×3, keeping the widest product within
    * decimal128 headroom through sf100.
    */
  private[graft] val olsMultiSql: String =
    """WITH e AS (
      |  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y,
      |    hour(ts) - 12 AS x1, (dayofweek(ts) - 1) - 3 AS x2
      |  FROM events),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x1 * x1) AS BIGINT) AS s11,
      |    CAST(SUM(x1 * x2) AS BIGINT) AS s12,
      |    CAST(SUM(x2 * x2) AS BIGINT) AS s22,
      |    CAST(SUM(x1 * y) AS BIGINT) AS s1y,
      |    CAST(SUM(x2 * y) AS BIGINT) AS s2y
      |  FROM e),
      |c AS (
      |  SELECT n, sy,
      |    CAST(n * s11 - s1 * s1 AS DECIMAL(38, 0)) AS c11,
      |    CAST(n * s12 - s1 * s2 AS DECIMAL(38, 0)) AS c12,
      |    CAST(n * s22 - s2 * s2 AS DECIMAL(38, 0)) AS c22,
      |    CAST(n * s1y - s1 * sy AS DECIMAL(38, 0)) AS c1y,
      |    CAST(n * s2y - s2 * sy AS DECIMAL(38, 0)) AS c2y,
      |    s1, s2
      |  FROM m)
      |SELECT n AS n_rows,
      |  CAST(CAST(c1y * c22 - c2y * c12 AS DOUBLE)
      |    / CAST(c11 * c22 - c12 * c12 AS DOUBLE) AS DOUBLE) AS beta_hour_cents,
      |  CAST(CAST(c2y * c11 - c1y * c12 AS DOUBLE)
      |    / CAST(c11 * c22 - c12 * c12 AS DOUBLE) AS DOUBLE) AS beta_dow_cents
      |FROM c""".stripMargin

  /** Calibration curve with a leakage-free temporal split: per-user
    * purchase propensity scored on the first half of the global time
    * range, outcomes observed on the second half, users bucketed by
    * score decile — mean score vs observed rate per bin is the
    * reliability diagram every model-quality gate plots. Two aggregate
    * passes over one scan; the split boundary is a broadcast scalar.
    */
  private[graft] val calibrationSql: String =
    """WITH b AS (
      |  SELECT (min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2 AS mid FROM events),
      |u AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN unix_micros(ts) < b.mid
      |        AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN unix_micros(ts) < b.mid THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |    CAST(MAX(CASE WHEN unix_micros(ts) >= b.mid
      |        AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS converted
      |  FROM events CROSS JOIN b GROUP BY user_id),
      |s AS (
      |  SELECT CAST(fp * 1000 DIV fn AS BIGINT) AS score_permille, converted
      |  FROM u WHERE fn > 0)
      |SELECT CAST(score_permille DIV 100 AS BIGINT) AS bin,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(SUM(score_permille) DIV count(*) AS BIGINT) AS mean_score_permille,
      |  CAST(SUM(converted) * 1000 DIV count(*) AS BIGINT) AS observed_permille
      |FROM s GROUP BY score_permille DIV 100""".stripMargin

  /** Explained-variance share of the dominant eigenvector: the Rayleigh
    * quotient λ = vᵀCv / vᵀv over the scaled Gram matrix, divided by its
    * trace — scale-invariant, so the integer max-norm rescaling cancels.
    * The one product that outgrows int64 (v·(Cv) terms) runs in
    * DECIMAL(38,0); the share is two IEEE divisions of exact values.
    * Completes the x_pca_power story: "the top component carries X% of
    * the variance" is the number that decides how many components a
    * whitening/compression pass keeps.
    */
  private[graft] val pcaExplainedSql: String =
    """WITH g AS (SELECT i, j, s FROM pca_g),
      |gm AS (SELECT CAST(MAX(ABS(s)) AS BIGINT) AS m FROM g),
      |c AS (SELECT i, j, s DIV ((SELECT m FROM gm) DIV 1000000 + 1) AS cn FROM g),
      |v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM c),
      |w1 AS (SELECT c.i, CAST(SUM(c.cn * v0.v) AS BIGINT) AS w
      |  FROM c JOIN v0 ON v0.i = c.j GROUP BY c.i),
      |v1 AS (SELECT i, w DIV ((SELECT MAX(ABS(w)) FROM w1) DIV 1000000 + 1) AS v FROM w1),
      |w2 AS (SELECT c.i, CAST(SUM(c.cn * v1.v) AS BIGINT) AS w
      |  FROM c JOIN v1 ON v1.i = c.j GROUP BY c.i),
      |v2 AS (SELECT i, w DIV ((SELECT MAX(ABS(w)) FROM w2) DIV 1000000 + 1) AS v FROM w2),
      |w3 AS (SELECT c.i, CAST(SUM(c.cn * v2.v) AS BIGINT) AS w
      |  FROM c JOIN v2 ON v2.i = c.j GROUP BY c.i),
      |v3 AS (SELECT i, w DIV ((SELECT MAX(ABS(w)) FROM w3) DIV 1000000 + 1) AS v FROM w3),
      |w4 AS (SELECT c.i, CAST(SUM(c.cn * v3.v) AS BIGINT) AS w
      |  FROM c JOIN v3 ON v3.i = c.j GROUP BY c.i),
      |r AS (
      |  SELECT
      |    CAST(SUM(CAST(v3.v AS DECIMAL(38, 0)) * CAST(w4.w AS DECIMAL(38, 0))) AS DECIMAL(38, 0)) AS num,
      |    CAST(SUM(v3.v * v3.v) AS BIGINT) AS den
      |  FROM v3 JOIN w4 ON w4.i = v3.i),
      |tr AS (SELECT CAST(SUM(cn) AS BIGINT) AS trace FROM c WHERE i = j)
      |SELECT tr.trace AS trace_scaled, r.den AS rayleigh_den,
      |  CAST(CAST(r.num AS DOUBLE) / CAST(r.den AS DOUBLE)
      |    / CAST(tr.trace AS DOUBLE) AS DOUBLE) AS explained_share
      |FROM r CROSS JOIN tr""".stripMargin

  /** Tie-aware Spearman rank correlation between per-user activity and
    * revenue: average ranks come from the VALUE-GROUPED distribution
    * (doubled to stay integer: 2·rank = 2·cumprev + c + 1 — the Gini/AUC
    * rank-block idiom), so users never individually rank and every
    * moment is an exact int64 sum. Windows run over distinct metric
    * values, the user-level join maps ranks back, and ρ leaves exact
    * arithmetic only in the final sqrt/divide chain of single IEEE ops.
    */
  /** The one events pass behind [[spearmanRankSql]] — materialized once
    * (localCheckpoint) because the rank stage references it three times
    * and Spark inlines CTEs: without the checkpoint the corpus would
    * scan three times.
    */
  private[graft] val spearmanUserSql: String =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS x,
      |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
      |FROM events GROUP BY user_id""".stripMargin

  private[graft] val spearmanRankSql: String =
    """WITH u AS (SELECT * FROM spearman_u),
      |rx AS (
      |  SELECT x, 2 * (CAST(SUM(c) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - c) + c + 1 AS r2
      |  FROM (SELECT x, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY x)),
      |ry AS (
      |  SELECT y, 2 * (CAST(SUM(c) OVER (ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - c) + c + 1 AS r2
      |  FROM (SELECT y, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY y)),
      |j AS (
      |  SELECT rx.r2 AS a, ry.r2 AS b
      |  FROM u JOIN rx ON rx.x = u.x JOIN ry ON ry.y = u.y),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
      |    CAST(SUM(a * b) AS BIGINT) AS sab,
      |    CAST(SUM(a * a) AS BIGINT) AS saa,
      |    CAST(SUM(b * b) AS BIGINT) AS sbb
      |  FROM j)
      |SELECT n AS n_users,
      |  CAST(n * sab - sa * sb AS BIGINT) AS cov_num,
      |  CAST(CAST(n * sab - sa * sb AS DOUBLE)
      |    / (SQRT(CAST(NULLIF(n * saa - sa * sa, 0) AS DOUBLE))
      |       * SQRT(CAST(NULLIF(n * sbb - sb * sb, 0) AS DOUBLE))) AS DOUBLE) AS rho
      |FROM m""".stripMargin

  // Incrementally-maintained Gram matrix over a versioned embedding
  // table: bootstrap on 80% of the vectors, then one churn window of
  // modulo-gated inserts / an exact-in-float ×2 update / deletes — all
  // replayable by the DuckDB oracle from the raw table. Memoized per
  // (session, dir) like the HLL-view fixture.
  private val gramViews =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), graft.ops.GramView]

  private def maintainedGram(s: SparkSession, dir: String): graft.ops.GramView =
    gramViews.synchronized {
      gramViews.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      gramViews.getOrElseUpdate((s, dir), {
        import org.apache.spark.sql.functions._
        val root = java.nio.file.Files.createTempDirectory("graft_gramview").toString
        val em = Tables(s, dir, "embeddings")
        val source = new graft.ops.CdcTable(s, s"$root/vecs", Seq("vec_id"),
          retainVersions = 5)
        source.init(em.filter(col("vec_id") % 10 < 8))
        val view = new graft.ops.GramView(s, source, s"$root/gram", "embedding")
        view.refresh()
        // churn window: late inserts, a ×2 rescale (exact in float32, so
        // the oracle's replay quantizes identically), and deletes
        source.merge(
          em.filter(col("vec_id") % 10 >= 8).withColumn("__op", lit("c"))
            .unionByName(em.filter(col("vec_id") % 10 === 0)
              .withColumn("embedding",
                expr("transform(embedding, e -> CAST(e * CAST(2.0 AS FLOAT) AS FLOAT))"))
              .withColumn("__op", lit("u")))
            .unionByName(em.filter(col("vec_id") % 10 === 1)
              .withColumn("__op", lit("d")))
            .withColumn("v_ts", lit(2L)),
          "v_ts")
        view.refresh()
        view
      })
    }

  /** Difference-in-differences: the causal-analytics workhorse — a
    * hash-assigned treatment group, a temporal pre/post split, and the
    * estimator (ΔT − ΔC) from the four cell means. One probe for the
    * split boundary, then ONE pass of conditional integer sums; every
    * mean is exact micro-cents by integer division.
    */
  private[graft] val didSql: String =
    s"""WITH b AS (
       |  SELECT (min(unix_micros(ts)) + max(unix_micros(ts))) DIV 2 AS mid FROM events),
       |e AS (
       |  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
       |    CASE WHEN ${h64("concat('did_', CAST(user_id AS STRING))")} % 2 = 1 THEN 1 ELSE 0 END AS treated,
       |    CASE WHEN unix_micros(ts) >= b.mid THEN 1 ELSE 0 END AS post
       |  FROM events CROSS JOIN b),
       |m AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN cents ELSE 0 END) * 1000000
       |      DIV NULLIF(SUM(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_t_post,
       |    CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN cents ELSE 0 END) * 1000000
       |      DIV NULLIF(SUM(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_t_pre,
       |    CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN cents ELSE 0 END) * 1000000
       |      DIV NULLIF(SUM(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_c_post,
       |    CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN cents ELSE 0 END) * 1000000
       |      DIV NULLIF(SUM(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_c_pre,
       |    CAST(count(*) AS BIGINT) AS n_rows
       |  FROM e)
       |SELECT n_rows, m_t_pre, m_t_post, m_c_pre, m_c_post,
       |  CAST((m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS BIGINT) AS did_microcents
       |FROM m""".stripMargin

  /** Split-conformal prediction interval: a 3-way hash split (train →
    * per-type mean model; calibration → nonconformity scores; test →
    * coverage), q̂ as the exact ⌈0.9(n+1)⌉-th order statistic of the
    * calibration scores via value-grouped cumulative counts (never a
    * per-row rank), and the empirical test coverage of μ ± q̂ — the
    * distribution-free ML-eval guarantee, all integer. The whole
    * score side lives in ONE tree: q̂ attaches by window, so events
    * scans twice (model probe + score pass), never more.
    */
  private[graft] val conformalSql: String =
    s"""WITH e AS (
       |  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
       |    ${h64("concat('cf_', CAST(event_id AS STRING))")} % 3 AS split
       |  FROM events),
       |m AS (
       |  SELECT event_type, CAST(SUM(cents) DIV count(*) AS BIGINT) AS mu
       |  FROM e WHERE split = 0 GROUP BY event_type),
       |scored AS (
       |  SELECT e.split, ABS(e.cents - m.mu) AS score
       |  FROM e JOIN m ON m.event_type = e.event_type WHERE e.split >= 1),
       |p AS (
       |  SELECT score,
       |    CAST(SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(SUM(CASE WHEN split = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
       |  FROM scored GROUP BY score),
       |w AS (
       |  SELECT score, c1, c2,
       |    SUM(c1) OVER (ORDER BY score) AS cum1,
       |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
       |  FROM p),
       |w2 AS (
       |  SELECT *, MIN(CASE WHEN cum1 * 10 >= (n1 + 1) * 9 THEN score END) OVER () AS qhat
       |  FROM w)
       |SELECT CAST(MAX(n1) AS BIGINT) AS n_cal, CAST(MAX(n2) AS BIGINT) AS n_test,
       |  CAST(MAX(qhat) AS BIGINT) AS qhat_cents,
       |  CAST(1000 * SUM(CASE WHEN score <= qhat THEN c2 ELSE 0 END)
       |    DIV MAX(n2) AS BIGINT) AS coverage_permille
       |FROM w2""".stripMargin

  /** Poisson bootstrap CI for the MEDIAN of per-user revenue — the
    * order-statistic bootstrap: each replica's weighted median comes
    * from value-grouped cumulative weights (distinct dollar totals,
    * never ranked users), the truth rides as sentinel replica r = -1
    * with weight 1, and the CI is the same rank-5/196 order statistics
    * as the mean bootstrap. Everything is one scan → one grouped
    * aggregate → replica-partitioned windows over the value grid.
    */
  private[graft] val bootstrapMedianSql: String =
    s"""WITH u AS (SELECT user_id, x FROM bs_u),
       |reps AS (SELECT explode(sequence(-1, ${R - 1})) AS r),
       |w0 AS (
       |  SELECT reps.r, u.x,
       |    CASE WHEN reps.r = -1 THEN -1 ELSE
       |      ${h64(s"concat('bm', CAST(reps.r AS STRING), '_', CAST(u.user_id AS STRING))")} % 1000000
       |    END AS uu
       |  FROM u CROSS JOIN reps),
       |w AS (
       |  SELECT r, x,
       |    CASE WHEN uu = -1 THEN 1 ELSE (${poissonOf("uu")}) END AS wt
       |  FROM w0),
       |g AS (SELECT r, x, CAST(SUM(wt) AS BIGINT) AS c FROM w GROUP BY r, x),
       |cw AS (
       |  SELECT r, x,
       |    SUM(c) OVER (PARTITION BY r ORDER BY x) AS cum,
       |    SUM(c) OVER (PARTITION BY r) AS n
       |  FROM g),
       |med AS (
       |  SELECT r, CAST(MIN(CASE WHEN 2 * cum >= n THEN x END) AS BIGINT) AS med
       |  FROM cw WHERE n > 0 GROUP BY r),
       |rk AS (SELECT r, med,
       |  row_number() OVER (PARTITION BY CASE WHEN r = -1 THEN 0 ELSE 1 END
       |    ORDER BY med, r) AS rn,
       |  count(*) OVER (PARTITION BY CASE WHEN r = -1 THEN 0 ELSE 1 END) AS m
       |  FROM med WHERE med IS NOT NULL)
       |SELECT
       |  CAST(MAX(CASE WHEN r = -1 THEN med END) AS BIGINT) AS point_median_cents,
       |  CAST(MAX(CASE WHEN r >= 0 AND rn = GREATEST(1, m * 25 DIV 1000)
       |    THEN med END) AS BIGINT) AS ci_lo_cents,
       |  CAST(MAX(CASE WHEN r >= 0 AND rn = m + 1 - GREATEST(1, m * 25 DIV 1000)
       |    THEN med END) AS BIGINT) AS ci_hi_cents
       |FROM rk""".stripMargin

  /** Inverse-propensity-weighted ATE: treatment assignment deliberately
    * CONFOUNDED with a covariate (daypart shifts the assignment rate),
    * propensities estimated as exact per-stratum shares, and the
    * Horvitz-Thompson estimator computed per stratum from integer
    * moments — each stratum's two weighted terms quantize to micro-cents
    * before the order-free sum. The naive treated-minus-control gap
    * rides along so the output shows what the reweighting corrected.
    * One pass: strata are a 4-row conditional aggregate.
    */
  private[graft] val ipwSql: String =
    s"""WITH e AS (
       |  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
       |    hour(ts) DIV 6 AS daypart,
       |    CASE WHEN ${h64("concat('ipw_', CAST(user_id AS STRING))")} % 100
       |      < 20 + 10 * (hour(ts) DIV 6) THEN 1 ELSE 0 END AS t
       |  FROM events),
       |g AS (
       |  SELECT daypart, CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(t) AS BIGINT) AS nt,
       |    CAST(SUM(t * cents) AS BIGINT) AS syt,
       |    CAST(SUM((1 - t) * cents) AS BIGINT) AS syc
       |  FROM e GROUP BY daypart),
       |terms AS (
       |  SELECT daypart, n, nt, syt, syc,
       |    CAST(syt * 1000000 DIV NULLIF(nt, 0) AS BIGINT) * n AS ht_t_micro,
       |    CAST(syc * 1000000 DIV NULLIF(n - nt, 0) AS BIGINT) * n AS ht_c_micro,
       |    CAST(1000 * nt DIV n AS BIGINT) AS p_permille
       |  FROM g)
       |SELECT
       |  CAST(SUM(n) AS BIGINT) AS n_rows,
       |  CAST(min(p_permille) AS BIGINT) AS p_min_permille,
       |  CAST(max(p_permille) AS BIGINT) AS p_max_permille,
       |  CAST((SUM(ht_t_micro) - SUM(ht_c_micro)) DIV SUM(n) AS BIGINT)
       |    AS ate_ipw_microcents,
       |  CAST(SUM(syt) * 1000000 DIV NULLIF(SUM(nt), 0)
       |    - SUM(syc) * 1000000 DIV NULLIF(SUM(n) - SUM(nt), 0) AS BIGINT)
       |    AS naive_gap_microcents
       |FROM terms""".stripMargin

  /** Power iteration CONSUMED FROM the maintained Gram view — the
    * end-to-end maintained-statistic story: the matrix was kept current
    * by CDF deltas (never recomputed), and the PCA reads it as a
    * d²-row table. Same integer max-norm rounds as x_pca_power; the
    * stored upper triangle mirrors to the full matrix first.
    */
  private[graft] val pcaFromViewSql: String =
    """WITH tri AS (SELECT i, j, s FROM gram_view_tbl),
      |g AS (
      |  SELECT i, j, s FROM tri
      |  UNION ALL
      |  SELECT j AS i, i AS j, s FROM tri WHERE i < j),
      |gm AS (SELECT CAST(MAX(ABS(s)) AS BIGINT) AS m FROM g),
      |c AS (SELECT i, j, s DIV ((SELECT m FROM gm) DIV 1000000 + 1) AS cn FROM g),
      |v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM c),
      |w1 AS (SELECT c.i, CAST(SUM(c.cn * v0.v) AS BIGINT) AS w
      |  FROM c JOIN v0 ON v0.i = c.j GROUP BY c.i),
      |v1 AS (SELECT i, w DIV ((SELECT MAX(ABS(w)) FROM w1) DIV 1000000 + 1) AS v FROM w1),
      |w2 AS (SELECT c.i, CAST(SUM(c.cn * v1.v) AS BIGINT) AS w
      |  FROM c JOIN v1 ON v1.i = c.j GROUP BY c.i),
      |v2 AS (SELECT i, w DIV ((SELECT MAX(ABS(w)) FROM w2) DIV 1000000 + 1) AS v FROM w2),
      |w3 AS (SELECT c.i, CAST(SUM(c.cn * v2.v) AS BIGINT) AS w
      |  FROM c JOIN v2 ON v2.i = c.j GROUP BY c.i)
      |SELECT CAST(i AS BIGINT) AS i,
      |  CAST(w DIV ((SELECT MAX(ABS(w)) FROM w3) DIV 1000000 + 1) AS BIGINT) AS v_micro
      |FROM w3""".stripMargin

  /** Doubly-robust (AIPW) ATE with a deliberately MISSPECIFIED outcome
    * model: the outcome regressions are the GLOBAL treated/control means
    * (wrong under confounding — that bias is the naive column), the
    * propensities are the exact per-stratum shares (right), and the
    * augmentation terms repair the model bias stratum by stratum — the
    * double-robustness guarantee as an executable fact. Same one-pass
    * stratum aggregate as x_ipw; the global model attaches by window
    * over the 4-row stratum table, inner divisions run before the n_g
    * scale-up so every intermediate stays within int64.
    */
  private[graft] val aipwSql: String =
    s"""WITH e AS (
       |  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
       |    hour(ts) DIV 6 AS daypart,
       |    CASE WHEN ${h64("concat('ipw_', CAST(user_id AS STRING))")} % 100
       |      < 20 + 10 * (hour(ts) DIV 6) THEN 1 ELSE 0 END AS t
       |  FROM events),
       |g AS (
       |  SELECT daypart, CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(t) AS BIGINT) AS nt,
       |    CAST(SUM(t * cents) AS BIGINT) AS syt,
       |    CAST(SUM((1 - t) * cents) AS BIGINT) AS syc
       |  FROM e GROUP BY daypart),
       |w AS (
       |  SELECT daypart, n, nt, syt, syc,
       |    SUM(syt) OVER () * 1000000 DIV SUM(nt) OVER () AS m1,
       |    SUM(syc) OVER () * 1000000 DIV (SUM(n) OVER () - SUM(nt) OVER ()) AS m0
       |  FROM g),
       |terms AS (
       |  SELECT n, m1, m0,
       |    n * (m1 - m0)
       |      + ((syt * 1000000 - nt * m1) DIV NULLIF(nt, 0)) * n
       |      - ((syc * 1000000 - (n - nt) * m0) DIV NULLIF(n - nt, 0)) * n AS contrib
       |  FROM w)
       |SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       |  CAST(MAX(m1) - MAX(m0) AS BIGINT) AS naive_model_gap_microcents,
       |  CAST(SUM(contrib) DIV SUM(n) AS BIGINT) AS ate_aipw_microcents
       |FROM terms""".stripMargin

  /** The one events pass behind [[theilSenRankSql]] — the daily-revenue
    * table, materialized (localCheckpoint) because the pairwise-slope
    * self-join references it twice.
    */
  private[graft] val theilSenDaySql: String =
    """SELECT unix_micros(ts) DIV 86400000000 AS day,
      |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
      |FROM events GROUP BY unix_micros(ts) DIV 86400000000""".stripMargin

  /** Theil–Sen robust trend: the exact (lower) median of all pairwise
    * daily-revenue slopes — outlier-days move OLS arbitrarily but shift
    * a median slope by at most one rank. The pair table is days², a
    * BOUNDED model table at any corpus size (the corpus term is the
    * daily roll-up); the median comes from value-grouped cumulative
    * counts, never a per-pair rank.
    */
  private[graft] val theilSenRankSql: String =
    """WITH d AS (SELECT * FROM theil_days),
      |p AS (
      |  SELECT (b.y - a.y) * 1000000 DIV (b.day - a.day) AS slope
      |  FROM d a JOIN d b ON b.day > a.day),
      |g AS (SELECT slope, CAST(count(*) AS BIGINT) AS c FROM p GROUP BY slope),
      |w AS (SELECT slope, SUM(c) OVER (ORDER BY slope) AS cum, SUM(c) OVER () AS n FROM g)
      |SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
      |  CAST(MIN(CASE WHEN 2 * cum >= n THEN slope END) AS BIGINT)
      |    AS theil_slope_microcents_per_day
      |FROM w""".stripMargin

  /** Brown–Forsythe variance-homogeneity test: ANOVA's F applied to
    * |y − median_g| — the robust Levene variant, the diagnostic that
    * decides whether ANOVA's equal-variance assumption holds at all.
    * Group medians come from value-grouped cumulative counts (windows
    * over each type's distinct cent values, never rows), broadcast back
    * as a tiny model table; the deviation ANOVA reuses the exact-moment
    * + per-group-milli-quantization discipline of x_anova_f. Two passes:
    * the median model probe and the deviation aggregate.
    */
  private[graft] val brownForsytheSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |vg AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS c
      |  FROM e GROUP BY event_type, cents),
      |cw AS (
      |  SELECT event_type, cents,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
      |    SUM(c) OVER (PARTITION BY event_type) AS n
      |  FROM vg),
      |med AS (
      |  SELECT event_type,
      |    CAST(MIN(CASE WHEN 2 * cum >= n THEN cents END) AS BIGINT) AS m
      |  FROM cw GROUP BY event_type),
      |z AS (
      |  SELECT e.event_type, ABS(e.cents - med.m) AS zv
      |  FROM e JOIN med ON med.event_type = e.event_type),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(SUM(zv) AS BIGINT) AS sg,
      |    CAST(SUM(zv * zv) AS BIGINT) AS qg
      |  FROM z GROUP BY event_type),
      |q AS (
      |  SELECT event_type, n, sg, qg,
      |    CAST(FLOOR(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
      |      / CAST(n AS DOUBLE) * 1000) AS BIGINT) AS sq_milli
      |  FROM g),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
      |    CAST(SUM(sg) AS BIGINT) AS s, CAST(SUM(qg) AS BIGINT) AS qq,
      |    CAST(SUM(sq_milli) AS BIGINT) AS sqm
      |  FROM q)
      |SELECT k AS n_groups, nn AS n_rows,
      |  CAST(
      |    (CAST(sqm - CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |       / CAST(nn AS DOUBLE) * 1000) AS BIGINT) AS DOUBLE) / CAST(k - 1 AS DOUBLE))
      |    / (CAST(qq * 1000 - sqm AS DOUBLE) / CAST(nn - k AS DOUBLE))
      |  AS DOUBLE) AS bf_stat
      |FROM t""".stripMargin

  /** Logistic-regression TRAINING (two IRLS/Newton iterations) — the
    * quality-classifier primitive of an LLM data pipeline, distributed
    * the only way iterative GLM fitting distributes: each iteration is
    * ONE map-side-combinable aggregate producing the 3×3 weighted
    * normal-equation moments (9 int64 cells cross the shuffle, never
    * rows), and the 1-row Cramer solve feeds the next iteration as
    * quantized micro-betas. Cross-engine exactness: the per-row sigmoid
    * is the ONLY transcendental and is floored onto the micro lattice
    * immediately (the x_benford idiom); the IRLS weight w = p(1−p) and
    * working response w·η + (y − p) are then PURE INTEGER functions of
    * p_micro, so every moment is an exact int64 and the double Cramer
    * chain evaluates the identical expression tree in both engines.
    * Feeding the QUANTIZED betas forward makes iteration 2's η an exact
    * integer ratio too — no double drift can compound across iterations.
    *
    * At 100 TB: per-iteration cost is one scan + a 9-cell aggregate; the
    * model (3 numbers) is the only driver-side data. k features would be
    * a k²-cell aggregate with the same shape (k ≪ corpus always).
    */
  private[graft] val lrBaseSql =
    """SELECT CAST(FLOOR(value) AS BIGINT) AS x1, CAST(hour(ts) AS BIGINT) AS x2,
      |  CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS y
      |FROM events WHERE value IS NOT NULL""".stripMargin

  /** One IRLS iteration: betas(micro) from `bView` applied over `dView`
    * (x1, x2, y), new quantized betas out. `div` is the integer-division
    * token (Spark ` DIV `, DuckDB ` // `); every other character is
    * identical in both dialects — the determinism contract.
    */
  private[graft] def lrIterSql(div: String, dView: String, bView: String): String =
    s"""SELECT
       |  CASE WHEN det = 0 THEN CAST(0 AS BIGINT) ELSE CAST(FLOOR((R0*(D*F - E*E) - B*(R1*F - E*R2) + C*(R1*E - D*R2)) / det * 1000000 + 0.5) AS BIGINT) END AS b0,
       |  CASE WHEN det = 0 THEN CAST(0 AS BIGINT) ELSE CAST(FLOOR((A*(R1*F - E*R2) - R0*(B*F - E*C) + C*(B*R2 - R1*C)) / det * 1000000 + 0.5) AS BIGINT) END AS b1,
       |  CASE WHEN det = 0 THEN CAST(0 AS BIGINT) ELSE CAST(FLOOR((A*(D*R2 - R1*E) - B*(B*R2 - R1*C) + R0*(B*E - D*C)) / det * 1000000 + 0.5) AS BIGINT) END AS b2
       |FROM (
       |  SELECT A, B, C, D, E, F, R0, R1, R2,
       |    A*(D*F - E*E) - B*(B*F - C*E) + C*(B*E - C*D) AS det
       |  FROM (
       |  SELECT CAST(sw AS DOUBLE) AS A, CAST(swx1 AS DOUBLE) AS B, CAST(swx2 AS DOUBLE) AS C,
       |    CAST(swx11 AS DOUBLE) AS D, CAST(swx12 AS DOUBLE) AS E, CAST(swx22 AS DOUBLE) AS F,
       |    CAST(sz AS DOUBLE) AS R0, CAST(szx1 AS DOUBLE) AS R1, CAST(szx2 AS DOUBLE) AS R2
       |  FROM (
       |    SELECT CAST(SUM(wm) AS BIGINT) AS sw,
       |      CAST(SUM(wm * x1) AS BIGINT) AS swx1, CAST(SUM(wm * x2) AS BIGINT) AS swx2,
       |      CAST(SUM(wm * x1 * x1) AS BIGINT) AS swx11,
       |      CAST(SUM(wm * x1 * x2) AS BIGINT) AS swx12,
       |      CAST(SUM(wm * x2 * x2) AS BIGINT) AS swx22,
       |      CAST(SUM(wzn) AS BIGINT) AS sz,
       |      CAST(SUM(wzn * x1) AS BIGINT) AS szx1, CAST(SUM(wzn * x2) AS BIGINT) AS szx2
       |    FROM (
       |      SELECT x1, x2, y, wm,
       |        ((wm * etan)$div 1000000) + (y * 1000000 - pm) AS wzn
       |      FROM (
       |        SELECT x1, x2, y, etan, pm,
       |          (pm * (1000000 - pm))$div 1000000 AS wm
       |        FROM (
       |          SELECT x1, x2, y, etan,
       |            CAST(FLOOR(1000000 / (1 + exp(-(CAST(etan AS DOUBLE) / 1000000.0)))) AS BIGINT) AS pm
       |          FROM (
       |            SELECT d.x1, d.x2, d.y,
       |              (b.b0 + b.b1 * d.x1 + b.b2 * d.x2) AS etan
       |            FROM $dView d CROSS JOIN $bView b) q1) q2) q3) q4) q5) q6) q7""".stripMargin

  private[graft] val lrZeroBetas =
    "(SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1, CAST(0 AS BIGINT) AS b2)"

  /** Gradient-boosted decision STUMPS (3 squared-error rounds) — the
    * tree half of the quality-classifier story, distributed the way
    * histogram GBDT actually distributes (the LightGBM shape): a round
    * never materializes per-row state — residuals are a CASE expression
    * over the prior stumps' 1-row parameter tables — and the split
    * search is ONE map-side-combinable histogram aggregate per feature
    * (value-bounded: ≤ |feature domain| groups) followed by a window
    * cumsum over the HISTOGRAM, so candidate thresholds never touch the
    * corpus again. Only the 1-row argmax stump reaches the driver.
    *
    * Determinism: residuals/counts/sums are exact int64 on the micro
    * lattice (no transcendental anywhere — unlike the logistic fit, the
    * squared-loss path is integer end-to-end); the split gain
    * S_L²/n_L + S_R²/n_R is a double computed from exact ints by an
    * identical expression tree, tie-broken (gain DESC, feature,
    * threshold); leaf values are integer divisions.
    */
  private[graft] def gbRowsSql(dView: String, stumps: Seq[String]): String = {
    val joins = stumps.map(s => s" CROSS JOIN $s").mkString
    val fExpr =
      if (stumps.isEmpty) "CAST(0 AS BIGINT)"
      else stumps.map(s =>
        s"(CASE WHEN (CASE WHEN $s.feature = 1 THEN d.x1 ELSE d.x2 END) <= " +
          s"$s.threshold THEN $s.w_left_micro ELSE $s.w_right_micro END)").mkString(" + ")
    s"SELECT d.x1, d.x2, d.y * 1000000 - ($fExpr) AS r FROM $dView d$joins"
  }

  /** One boosting round's split search over `rowsRef` (a table/CTE name
    * or a parenthesized subquery yielding (x1, x2, r)). `div` is the
    * integer-division token; all other text is engine-identical.
    */
  private[graft] def gbRoundSql(div: String, rowsRef: String): String =
    s"""SELECT feature, threshold, n_left, w_left_micro, w_right_micro
       |FROM (
       |  SELECT feature, threshold, nL AS n_left,
       |    SL$div nL AS w_left_micro,
       |    (S - SL)$div (n - nL) AS w_right_micro,
       |    (CAST(SL AS DOUBLE) * CAST(SL AS DOUBLE)) / CAST(nL AS DOUBLE)
       |      + (CAST(S - SL AS DOUBLE) * CAST(S - SL AS DOUBLE)) / CAST(n - nL AS DOUBLE) AS gain
       |  FROM (
       |    SELECT feature, value AS threshold,
       |      CAST(SUM(cnt) OVER wv AS BIGINT) AS nL, CAST(SUM(sr) OVER wv AS BIGINT) AS SL,
       |      CAST(SUM(cnt) OVER wf AS BIGINT) AS n, CAST(SUM(sr) OVER wf AS BIGINT) AS S
       |    FROM (
       |      SELECT 1 AS feature, x1 AS value, CAST(count(*) AS BIGINT) AS cnt, CAST(SUM(r) AS BIGINT) AS sr
       |      FROM $rowsRef GROUP BY x1
       |      UNION ALL
       |      SELECT 2 AS feature, x2 AS value, CAST(count(*) AS BIGINT) AS cnt, CAST(SUM(r) AS BIGINT) AS sr
       |      FROM $rowsRef GROUP BY x2) h
       |    WINDOW wv AS (PARTITION BY feature ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |      wf AS (PARTITION BY feature)) c
       |  WHERE nL < n) g
       |ORDER BY gain DESC, feature, threshold LIMIT 1""".stripMargin

  private[graft] def gbFinalSql(stumps: Seq[String]): String =
    stumps.zipWithIndex.map { case (s, i) =>
      s"SELECT CAST(${i + 1} AS BIGINT) AS round, feature, threshold, n_left, " +
        s"w_left_micro, w_right_micro FROM $s"
    }.mkString("\nUNION ALL ")

  /** Spec hook: fit 3 boosting rounds over whatever view holds
    * (x1, x2, y) — board query and spec share this path.
    */
  private[graft] def gbdtOver(s: SparkSession, baseView: String): DataFrame = {
    val stumps = scala.collection.mutable.Buffer.empty[String]
    (1 to 3).foreach { t =>
      val rows = s"(${gbRowsSql(baseView, stumps.toSeq)})"
      val name = s"gb_s$t"
      s.sql(gbRoundSql(" DIV", rows)).localCheckpoint().createOrReplaceTempView(name)
      stumps += name
    }
    s.sql(gbFinalSql(stumps.toSeq))
  }

  private[graft] val lrFinalSql =
    """SELECT CAST(1 AS BIGINT) AS iter, b0 AS b0_micro, b1 AS b1_micro, b2 AS b2_micro FROM lr_b1
      |UNION ALL
      |SELECT CAST(2 AS BIGINT) AS iter, b0 AS b0_micro, b1 AS b1_micro, b2 AS b2_micro FROM lr_b2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_gbdt_stumps" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      Tables.cacheView("gb_base", s.sql(lrBaseSql)) // shared feature frame
      gbdtOver(s, "gb_base")
    }),
    "x_logreg_irls" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      Tables.cacheView("lr_base", s.sql(lrBaseSql)) // scanned once per iteration
      s.sql(lrIterSql(" DIV", "lr_base", lrZeroBetas))
        .localCheckpoint().createOrReplaceTempView("lr_b1")
      s.sql(lrIterSql(" DIV", "lr_base", "lr_b1"))
        .localCheckpoint().createOrReplaceTempView("lr_b2")
      s.sql(lrFinalSql)
    }),
    "x_brown_forsythe" -> ((s, dir) => events(s, dir, brownForsytheSql)),
    "x_theil_sen" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      s.sql(theilSenDaySql).localCheckpoint().createOrReplaceTempView("theil_days")
      s.sql(theilSenRankSql)
    }),
    "x_aipw" -> ((s, dir) => events(s, dir, aipwSql)),
    "x_pca_view_incremental" -> ((s, dir) => {
      maintainedGram(s, dir).table.read.createOrReplaceTempView("gram_view_tbl")
      s.sql(pcaFromViewSql)
    }),
    "x_ipw" -> ((s, dir) => events(s, dir, ipwSql)),
    "x_conformal" -> ((s, dir) => events(s, dir, conformalSql)),
    "x_bootstrap_median" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      Tables.cacheView("bs_u", s.sql(bootstrapUserSql))
      s.sql(bootstrapMedianSql)
    }),
    "x_did" -> ((s, dir) => events(s, dir, didSql)),
    "x_gram_view_incremental" -> ((s, dir) =>
      maintainedGram(s, dir).table.read.select("i", "j", "s")),
    "x_pca_explained" -> ((s, dir) => {
      Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      overGram(s, pcaExplainedSql)
    }),
    "x_spearman" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      s.sql(spearmanUserSql).localCheckpoint().createOrReplaceTempView("spearman_u")
      s.sql(spearmanRankSql)
    }),
    "x_anova_f" -> ((s, dir) => events(s, dir, anovaSql)),
    "x_permutation_test" -> ((s, dir) => events(s, dir, permutationTestSql)),
    "x_ols_multi" -> ((s, dir) => events(s, dir, olsMultiSql)),
    "x_calibration" -> ((s, dir) => events(s, dir, calibrationSql)),
    "x_bootstrap_ci" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events")
      Tables.cacheView("bs_u", s.sql(bootstrapUserSql))
      s.sql(bootstrapSql)
    }),
    "x_js_divergence" -> ((s, dir) => {
      Tables(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql(jsTermCountsSql).localCheckpoint().createOrReplaceTempView("js_st")
      s.sql(jsDivergenceRankSql)
    }),
    "x_target_encoding" -> ((s, dir) => events(s, dir, targetEncodingSql)),
    "x_gram_matrix" -> ((s, dir) => embs(s, dir, gramMatrixSql)),
    "x_pca_power" -> ((s, dir) => {
      Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      overGram(s, pcaPowerSql)
    })
  )

  def oracle: Map[String, String] = Map(

    "x_gbdt_stumps" -> {
      val parts = scala.collection.mutable.Buffer(
        s"d AS MATERIALIZED (\n$lrBaseSql)")
      val stumps = scala.collection.mutable.Buffer.empty[String]
      (1 to 3).foreach { t =>
        parts += s"rows$t AS MATERIALIZED (${gbRowsSql("d", stumps.toSeq)})"
        parts += s"st$t AS MATERIALIZED (\n${gbRoundSql(" //", s"rows$t")})"
        stumps += s"st$t"
      }
      "WITH " + parts.mkString(",\n") + "\n" + gbFinalSql(stumps.toSeq)
    },

    "x_logreg_irls" -> {
      s"""WITH d AS MATERIALIZED (
         |${lrBaseSql}),
         |b1t AS MATERIALIZED (
         |${lrIterSql(" //", "d", lrZeroBetas)}),
         |b2t AS MATERIALIZED (
         |${lrIterSql(" //", "d", "b1t")})
         |SELECT CAST(1 AS BIGINT) AS iter, b0 AS b0_micro, b1 AS b1_micro, b2 AS b2_micro FROM b1t
         |UNION ALL
         |SELECT CAST(2 AS BIGINT) AS iter, b0 AS b0_micro, b1 AS b1_micro, b2 AS b2_micro FROM b2t""".stripMargin
    },

    "x_brown_forsythe" ->
      """WITH e AS (
        |  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |vg AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS c
        |  FROM e GROUP BY event_type, cents),
        |cw AS (
        |  SELECT event_type, cents,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS n
        |  FROM vg),
        |med AS (
        |  SELECT event_type,
        |    CAST(MIN(CASE WHEN 2 * cum >= n THEN cents END) AS BIGINT) AS m
        |  FROM cw GROUP BY event_type),
        |z AS (
        |  SELECT e.event_type, ABS(e.cents - med.m) AS zv
        |  FROM e JOIN med ON med.event_type = e.event_type),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(zv) AS BIGINT) AS sg,
        |    CAST(SUM(zv * zv) AS BIGINT) AS qg
        |  FROM z GROUP BY event_type),
        |q AS (
        |  SELECT event_type, n, sg, qg,
        |    CAST(FLOOR(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(n AS DOUBLE) * 1000) AS BIGINT) AS sq_milli
        |  FROM g),
        |t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(sg) AS BIGINT) AS s, CAST(SUM(qg) AS BIGINT) AS qq,
        |    CAST(SUM(sq_milli) AS BIGINT) AS sqm
        |  FROM q)
        |SELECT k AS n_groups, nn AS n_rows,
        |  CAST(
        |    (CAST(sqm - CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |       / CAST(nn AS DOUBLE) * 1000) AS BIGINT) AS DOUBLE) / CAST(k - 1 AS DOUBLE))
        |    / (CAST(qq * 1000 - sqm AS DOUBLE) / CAST(nn - k AS DOUBLE))
        |  AS DOUBLE) AS bf_stat
        |FROM t""".stripMargin,

    "x_theil_sen" ->
      """WITH d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY epoch_us(ts) // 86400000000),
        |p AS (
        |  SELECT (b.y - a.y) * 1000000 // (b.day - a.day) AS slope
        |  FROM d a JOIN d b ON b.day > a.day),
        |g AS (SELECT slope, CAST(count(*) AS BIGINT) AS c FROM p GROUP BY slope),
        |w AS (SELECT slope, SUM(c) OVER (ORDER BY slope) AS cum, SUM(c) OVER () AS n FROM g)
        |SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
        |  CAST(MIN(CASE WHEN 2 * cum >= n THEN slope END) AS BIGINT)
        |    AS theil_slope_microcents_per_day
        |FROM w""".stripMargin,

    "x_aipw" ->
      s"""WITH e AS (
         |  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         |    hour(ts) // 6 AS daypart,
         |    CASE WHEN ${duckH64("('ipw_' || user_id)")} % 100
         |      < 20 + 10 * (hour(ts) // 6) THEN 1 ELSE 0 END AS t
         |  FROM events),
         |g AS (
         |  SELECT daypart, CAST(count(*) AS BIGINT) AS n,
         |    CAST(SUM(t) AS BIGINT) AS nt,
         |    CAST(SUM(t * cents) AS BIGINT) AS syt,
         |    CAST(SUM((1 - t) * cents) AS BIGINT) AS syc
         |  FROM e GROUP BY daypart),
         |w AS (
         |  SELECT daypart, n, nt, syt, syc,
         |    SUM(syt) OVER () * 1000000 // SUM(nt) OVER () AS m1,
         |    SUM(syc) OVER () * 1000000 // (SUM(n) OVER () - SUM(nt) OVER ()) AS m0
         |  FROM g),
         |terms AS (
         |  SELECT n, m1, m0,
         |    n * (m1 - m0)
         |      + ((syt * 1000000 - nt * m1) // NULLIF(nt, 0)) * n
         |      - ((syc * 1000000 - (n - nt) * m0) // NULLIF(n - nt, 0)) * n AS contrib
         |  FROM w)
         |SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
         |  CAST(MAX(m1) - MAX(m0) AS BIGINT) AS naive_model_gap_microcents,
         |  CAST(SUM(contrib) // SUM(n) AS BIGINT) AS ate_aipw_microcents
         |FROM terms""".stripMargin,

    "x_pca_view_incremental" ->
      """WITH src AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 10 = 0
        |      THEN [CAST(e * CAST(2.0 AS FLOAT) AS FLOAT) FOR e IN embedding]
        |      ELSE embedding END AS embedding
        |  FROM embeddings WHERE vec_id % 10 != 1),
        |q AS (
        |  SELECT [CAST(FLOOR(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT) FOR e IN embedding] AS qv
        |  FROM src),
        |x AS (
        |  SELECT r1.i - 1 AS i, r2.j - 1 AS j, q.qv[r1.i] * q.qv[r2.j] AS p
        |  FROM q, range(1, 65) r1(i), range(1, 65) r2(j)),
        |g AS (SELECT i, j, CAST(SUM(p) AS BIGINT) AS s FROM x GROUP BY i, j),
        |gm AS (SELECT CAST(MAX(ABS(s)) AS BIGINT) AS m FROM g),
        |c AS (SELECT i, j, s // ((SELECT m FROM gm) // 1000000 + 1) AS cn FROM g),
        |v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM c),
        |w1 AS (SELECT c.i, CAST(SUM(c.cn * v0.v) AS BIGINT) AS w
        |  FROM c JOIN v0 ON v0.i = c.j GROUP BY c.i),
        |v1 AS (SELECT i, w // ((SELECT MAX(ABS(w)) FROM w1) // 1000000 + 1) AS v FROM w1),
        |w2 AS (SELECT c.i, CAST(SUM(c.cn * v1.v) AS BIGINT) AS w
        |  FROM c JOIN v1 ON v1.i = c.j GROUP BY c.i),
        |v2 AS (SELECT i, w // ((SELECT MAX(ABS(w)) FROM w2) // 1000000 + 1) AS v FROM w2),
        |w3 AS (SELECT c.i, CAST(SUM(c.cn * v2.v) AS BIGINT) AS w
        |  FROM c JOIN v2 ON v2.i = c.j GROUP BY c.i)
        |SELECT CAST(i AS BIGINT) AS i,
        |  CAST(w // ((SELECT MAX(ABS(w)) FROM w3) // 1000000 + 1) AS BIGINT) AS v_micro
        |FROM w3""".stripMargin,

    "x_ipw" ->
      s"""WITH e AS (
         |  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         |    hour(ts) // 6 AS daypart,
         |    CASE WHEN ${duckH64("('ipw_' || user_id)")} % 100
         |      < 20 + 10 * (hour(ts) // 6) THEN 1 ELSE 0 END AS t
         |  FROM events),
         |g AS (
         |  SELECT daypart, CAST(count(*) AS BIGINT) AS n,
         |    CAST(SUM(t) AS BIGINT) AS nt,
         |    CAST(SUM(t * cents) AS BIGINT) AS syt,
         |    CAST(SUM((1 - t) * cents) AS BIGINT) AS syc
         |  FROM e GROUP BY daypart),
         |terms AS (
         |  SELECT daypart, n, nt, syt, syc,
         |    CAST(syt * 1000000 // NULLIF(nt, 0) AS BIGINT) * n AS ht_t_micro,
         |    CAST(syc * 1000000 // NULLIF(n - nt, 0) AS BIGINT) * n AS ht_c_micro,
         |    CAST(1000 * nt // n AS BIGINT) AS p_permille
         |  FROM g)
         |SELECT
         |  CAST(SUM(n) AS BIGINT) AS n_rows,
         |  CAST(min(p_permille) AS BIGINT) AS p_min_permille,
         |  CAST(max(p_permille) AS BIGINT) AS p_max_permille,
         |  CAST((SUM(ht_t_micro) - SUM(ht_c_micro)) // SUM(n) AS BIGINT)
         |    AS ate_ipw_microcents,
         |  CAST(SUM(syt) * 1000000 // NULLIF(SUM(nt), 0)
         |    - SUM(syc) * 1000000 // NULLIF(SUM(n) - SUM(nt), 0) AS BIGINT)
         |    AS naive_gap_microcents
         |FROM terms""".stripMargin,

    "x_conformal" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         |    ${duckH64("('cf_' || event_id)")} % 3 AS split
         |  FROM events),
         |m AS (
         |  SELECT event_type, CAST(SUM(cents) // count(*) AS BIGINT) AS mu
         |  FROM e WHERE split = 0 GROUP BY event_type),
         |scored AS (
         |  SELECT e.split, ABS(e.cents - m.mu) AS score
         |  FROM e JOIN m ON m.event_type = e.event_type WHERE e.split >= 1),
         |p AS (
         |  SELECT score,
         |    CAST(SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(SUM(CASE WHEN split = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
         |  FROM scored GROUP BY score),
         |w AS (
         |  SELECT score, c1, c2,
         |    SUM(c1) OVER (ORDER BY score) AS cum1,
         |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
         |  FROM p),
         |w2 AS (
         |  SELECT *, MIN(CASE WHEN cum1 * 10 >= (n1 + 1) * 9 THEN score END) OVER () AS qhat
         |  FROM w)
         |SELECT CAST(MAX(n1) AS BIGINT) AS n_cal, CAST(MAX(n2) AS BIGINT) AS n_test,
         |  CAST(MAX(qhat) AS BIGINT) AS qhat_cents,
         |  CAST(1000 * SUM(CASE WHEN score <= qhat THEN c2 ELSE 0 END)
         |    // MAX(n2) AS BIGINT) AS coverage_permille
         |FROM w2""".stripMargin,

    "x_bootstrap_median" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY user_id),
         |reps AS (SELECT unnest(range(-1, $R)) AS r),
         |w0 AS (
         |  SELECT reps.r, u.x,
         |    CASE WHEN reps.r = -1 THEN -1 ELSE
         |      ${duckH64("('bm' || reps.r || '_' || u.user_id)")} % 1000000
         |    END AS uu
         |  FROM u CROSS JOIN reps),
         |w AS (
         |  SELECT r, x,
         |    CASE WHEN uu = -1 THEN 1 ELSE (${poissonOf("uu")}) END AS wt
         |  FROM w0),
         |g AS (SELECT r, x, CAST(SUM(wt) AS BIGINT) AS c FROM w GROUP BY r, x),
         |cw AS (
         |  SELECT r, x,
         |    SUM(c) OVER (PARTITION BY r ORDER BY x) AS cum,
         |    SUM(c) OVER (PARTITION BY r) AS n
         |  FROM g),
         |med AS (
         |  SELECT r, CAST(MIN(CASE WHEN 2 * cum >= n THEN x END) AS BIGINT) AS med
         |  FROM cw WHERE n > 0 GROUP BY r),
         |rk AS (SELECT r, med,
         |  row_number() OVER (PARTITION BY CASE WHEN r = -1 THEN 0 ELSE 1 END
         |    ORDER BY med, r) AS rn,
         |  count(*) OVER (PARTITION BY CASE WHEN r = -1 THEN 0 ELSE 1 END) AS m
         |  FROM med WHERE med IS NOT NULL)
         |SELECT
         |  CAST(MAX(CASE WHEN r = -1 THEN med END) AS BIGINT) AS point_median_cents,
         |  CAST(MAX(CASE WHEN r >= 0 AND rn = GREATEST(1, m * 25 // 1000)
         |    THEN med END) AS BIGINT) AS ci_lo_cents,
         |  CAST(MAX(CASE WHEN r >= 0 AND rn = m + 1 - GREATEST(1, m * 25 // 1000)
         |    THEN med END) AS BIGINT) AS ci_hi_cents
         |FROM rk""".stripMargin,

    "x_did" ->
      s"""WITH b AS (
         |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
         |e AS (
         |  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         |    CASE WHEN ${duckH64("('did_' || user_id)")} % 2 = 1 THEN 1 ELSE 0 END AS treated,
         |    CASE WHEN epoch_us(ts) >= b.mid THEN 1 ELSE 0 END AS post
         |  FROM events CROSS JOIN b),
         |m AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN cents ELSE 0 END) * 1000000
         |      // NULLIF(SUM(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_t_post,
         |    CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN cents ELSE 0 END) * 1000000
         |      // NULLIF(SUM(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_t_pre,
         |    CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN cents ELSE 0 END) * 1000000
         |      // NULLIF(SUM(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_c_post,
         |    CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN cents ELSE 0 END) * 1000000
         |      // NULLIF(SUM(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_c_pre,
         |    CAST(count(*) AS BIGINT) AS n_rows
         |  FROM e)
         |SELECT n_rows, m_t_pre, m_t_post, m_c_pre, m_c_post,
         |  CAST((m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS BIGINT) AS did_microcents
         |FROM m""".stripMargin,

    "x_gram_view_incremental" ->
      """WITH src AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 10 = 0
        |      THEN [CAST(e * CAST(2.0 AS FLOAT) AS FLOAT) FOR e IN embedding]
        |      ELSE embedding END AS embedding
        |  FROM embeddings WHERE vec_id % 10 != 1),
        |q AS (
        |  SELECT [CAST(FLOOR(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT) FOR e IN embedding] AS qv
        |  FROM src),
        |x AS (
        |  SELECT r1.i - 1 AS i, r2.j - 1 AS j, q.qv[r1.i] * q.qv[r2.j] AS p
        |  FROM q, range(1, 65) r1(i), range(1, 65) r2(j)
        |  WHERE r1.i <= r2.j)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(SUM(p) AS BIGINT) AS s
        |FROM x GROUP BY i, j""".stripMargin,

    "x_pca_explained" ->
      """WITH q AS (
        |  SELECT [CAST(FLOOR(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT) FOR e IN embedding] AS qv
        |  FROM embeddings),
        |x AS (
        |  SELECT r1.i - 1 AS i, r2.j - 1 AS j, q.qv[r1.i] * q.qv[r2.j] AS p
        |  FROM q, range(1, 65) r1(i), range(1, 65) r2(j)),
        |g AS (SELECT i, j, CAST(SUM(p) AS BIGINT) AS s FROM x GROUP BY i, j),
        |gm AS (SELECT CAST(MAX(ABS(s)) AS BIGINT) AS m FROM g),
        |c AS (SELECT i, j, s // ((SELECT m FROM gm) // 1000000 + 1) AS cn FROM g),
        |v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM c),
        |w1 AS (SELECT c.i, CAST(SUM(c.cn * v0.v) AS BIGINT) AS w
        |  FROM c JOIN v0 ON v0.i = c.j GROUP BY c.i),
        |v1 AS (SELECT i, w // ((SELECT MAX(ABS(w)) FROM w1) // 1000000 + 1) AS v FROM w1),
        |w2 AS (SELECT c.i, CAST(SUM(c.cn * v1.v) AS BIGINT) AS w
        |  FROM c JOIN v1 ON v1.i = c.j GROUP BY c.i),
        |v2 AS (SELECT i, w // ((SELECT MAX(ABS(w)) FROM w2) // 1000000 + 1) AS v FROM w2),
        |w3 AS (SELECT c.i, CAST(SUM(c.cn * v2.v) AS BIGINT) AS w
        |  FROM c JOIN v2 ON v2.i = c.j GROUP BY c.i),
        |v3 AS (SELECT i, w // ((SELECT MAX(ABS(w)) FROM w3) // 1000000 + 1) AS v FROM w3),
        |w4 AS (SELECT c.i, CAST(SUM(c.cn * v3.v) AS BIGINT) AS w
        |  FROM c JOIN v3 ON v3.i = c.j GROUP BY c.i),
        |r AS (
        |  SELECT
        |    CAST(SUM(CAST(v3.v AS DECIMAL(38, 0)) * CAST(w4.w AS DECIMAL(38, 0))) AS DECIMAL(38, 0)) AS num,
        |    CAST(SUM(v3.v * v3.v) AS BIGINT) AS den
        |  FROM v3 JOIN w4 ON w4.i = v3.i),
        |tr AS (SELECT CAST(SUM(cn) AS BIGINT) AS trace FROM c WHERE i = j)
        |SELECT tr.trace AS trace_scaled, r.den AS rayleigh_den,
        |  CAST(CAST(r.num AS DOUBLE) / CAST(r.den AS DOUBLE)
        |    / CAST(tr.trace AS DOUBLE) AS DOUBLE) AS explained_share
        |FROM r CROSS JOIN tr""".stripMargin,

    "x_spearman" ->
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
        |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |rx AS (
        |  SELECT x, 2 * (CAST(SUM(c) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - c) + c + 1 AS r2
        |  FROM (SELECT x, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY x)),
        |ry AS (
        |  SELECT y, 2 * (CAST(SUM(c) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - c) + c + 1 AS r2
        |  FROM (SELECT y, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY y)),
        |j AS (
        |  SELECT rx.r2 AS a, ry.r2 AS b
        |  FROM u JOIN rx ON rx.x = u.x JOIN ry ON ry.y = u.y),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
        |    CAST(SUM(a * b) AS BIGINT) AS sab,
        |    CAST(SUM(a * a) AS BIGINT) AS saa,
        |    CAST(SUM(b * b) AS BIGINT) AS sbb
        |  FROM j)
        |SELECT n AS n_users,
        |  CAST(n * sab - sa * sb AS BIGINT) AS cov_num,
        |  CAST(CAST(n * sab - sa * sb AS DOUBLE)
        |    / (SQRT(CAST(NULLIF(n * saa - sa * sa, 0) AS DOUBLE))
        |       * SQRT(CAST(NULLIF(n * sbb - sb * sb, 0) AS DOUBLE))) AS DOUBLE) AS rho
        |FROM m""".stripMargin,

    "x_anova_f" ->
      """WITH e AS (
        |  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sg,
        |    CAST(SUM(cents * cents) AS BIGINT) AS qg
        |  FROM e GROUP BY event_type),
        |q AS (
        |  SELECT event_type, n, sg, qg,
        |    CAST(FLOOR(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(n AS DOUBLE) * 1000) AS BIGINT) AS sq_milli
        |  FROM g),
        |t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(sg) AS BIGINT) AS s, CAST(SUM(qg) AS BIGINT) AS qq,
        |    CAST(SUM(sq_milli) AS BIGINT) AS sqm
        |  FROM q)
        |SELECT k AS n_groups, nn AS n_rows,
        |  CAST(sqm - CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |    / CAST(nn AS DOUBLE) * 1000) AS BIGINT) AS BIGINT) AS ssb_milli,
        |  CAST(qq * 1000 - sqm AS BIGINT) AS ssw_milli,
        |  CAST(
        |    (CAST(sqm - CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |       / CAST(nn AS DOUBLE) * 1000) AS BIGINT) AS DOUBLE) / CAST(k - 1 AS DOUBLE))
        |    / (CAST(qq * 1000 - sqm AS DOUBLE) / CAST(nn - k AS DOUBLE))
        |  AS DOUBLE) AS f_stat
        |FROM t""".stripMargin,

    "x_permutation_test" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type,
         |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
         |  FROM events WHERE event_type IN ('purchase', 'click')),
         |cnt AS (
         |  SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    CAST(count(*) AS BIGINT) AS nt
         |  FROM e),
         |reps AS (SELECT unnest(range(-1, $R)) AS r),
         |lab AS (
         |  SELECT reps.r, e.cents,
         |    CASE WHEN reps.r = -1 THEN (CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
         |      WHEN ${duckH64("('pm' || reps.r || '_' || e.event_id)")} % cnt.nt < cnt.na
         |      THEN 1 ELSE 0 END AS la
         |  FROM e CROSS JOIN cnt CROSS JOIN reps),
         |d AS (
         |  SELECT r, CAST(SUM(la) AS BIGINT) AS na,
         |    CAST(SUM(1 - la) AS BIGINT) AS nb,
         |    SUM(la * cents) * 1000000 // NULLIF(SUM(la), 0)
         |      - SUM((1 - la) * cents) * 1000000 // NULLIF(SUM(1 - la), 0) AS dr
         |  FROM lab GROUP BY r),
         |z AS (SELECT r, na, nb, dr,
         |  MAX(CASE WHEN r = -1 THEN dr END) OVER () AS dobs FROM d)
         |SELECT
         |  CAST(MAX(CASE WHEN r = -1 THEN na END) AS BIGINT) AS n_purchase,
         |  CAST(MAX(CASE WHEN r = -1 THEN nb END) AS BIGINT) AS n_click,
         |  CAST(MAX(CASE WHEN r = -1 THEN dr END) AS BIGINT) AS d_obs_microcents,
         |  CAST(1000 * SUM(CASE WHEN r >= 0 AND ABS(dr) >= ABS(dobs) THEN 1 ELSE 0 END)
         |    // ${R} AS BIGINT) AS p_permille
         |FROM z""".stripMargin,

    "x_ols_multi" ->
      """WITH e AS (
        |  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y,
        |    hour(ts) - 12 AS x1, dayofweek(ts) - 3 AS x2
        |  FROM events),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x1 * x1) AS BIGINT) AS s11,
        |    CAST(SUM(x1 * x2) AS BIGINT) AS s12,
        |    CAST(SUM(x2 * x2) AS BIGINT) AS s22,
        |    CAST(SUM(x1 * y) AS BIGINT) AS s1y,
        |    CAST(SUM(x2 * y) AS BIGINT) AS s2y
        |  FROM e),
        |c AS (
        |  SELECT n, sy,
        |    CAST(n * s11 - s1 * s1 AS DECIMAL(38, 0)) AS c11,
        |    CAST(n * s12 - s1 * s2 AS DECIMAL(38, 0)) AS c12,
        |    CAST(n * s22 - s2 * s2 AS DECIMAL(38, 0)) AS c22,
        |    CAST(n * s1y - s1 * sy AS DECIMAL(38, 0)) AS c1y,
        |    CAST(n * s2y - s2 * sy AS DECIMAL(38, 0)) AS c2y,
        |    s1, s2
        |  FROM m)
        |SELECT n AS n_rows,
        |  CAST(CAST(c1y * c22 - c2y * c12 AS DOUBLE)
        |    / CAST(c11 * c22 - c12 * c12 AS DOUBLE) AS DOUBLE) AS beta_hour_cents,
        |  CAST(CAST(c2y * c11 - c1y * c12 AS DOUBLE)
        |    / CAST(c11 * c22 - c12 * c12 AS DOUBLE) AS DOUBLE) AS beta_dow_cents
        |FROM c""".stripMargin,

    "x_calibration" ->
      """WITH b AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
        |u AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN epoch_us(ts) < b.mid
        |        AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN epoch_us(ts) < b.mid THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(MAX(CASE WHEN epoch_us(ts) >= b.mid
        |        AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS converted
        |  FROM events CROSS JOIN b GROUP BY user_id),
        |s AS (
        |  SELECT CAST(fp * 1000 // fn AS BIGINT) AS score_permille, converted
        |  FROM u WHERE fn > 0)
        |SELECT CAST(score_permille // 100 AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(SUM(score_permille) // count(*) AS BIGINT) AS mean_score_permille,
        |  CAST(SUM(converted) * 1000 // count(*) AS BIGINT) AS observed_permille
        |FROM s GROUP BY score_permille // 100""".stripMargin,

    "x_bootstrap_ci" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY user_id),
         |reps AS (SELECT unnest(range(-1, $R)) AS r),
         |w0 AS (
         |  SELECT reps.r, u.x,
         |    CASE WHEN reps.r = -1 THEN -1 ELSE
         |      ${duckH64("('bs' || reps.r || '_' || u.user_id)")} % 1000000
         |    END AS uu
         |  FROM u CROSS JOIN reps),
         |w AS (
         |  SELECT r, x,
         |    CASE WHEN uu = -1 THEN 1 ELSE (${poissonOf("uu")}) END AS wt
         |  FROM w0),
         |m AS (
         |  SELECT r, CAST(count(*) AS BIGINT) AS n_users,
         |    CAST(SUM(wt * x) // NULLIF(SUM(wt), 0) AS BIGINT) AS mean_cents
         |  FROM w GROUP BY r),
         |rk AS (SELECT r, n_users, mean_cents,
         |  row_number() OVER (PARTITION BY CASE WHEN r = -1 THEN 0 ELSE 1 END
         |    ORDER BY mean_cents, r) AS rn,
         |  count(*) OVER (PARTITION BY CASE WHEN r = -1 THEN 0 ELSE 1 END) AS m
         |  FROM m WHERE mean_cents IS NOT NULL)
         |SELECT
         |  CAST(MAX(CASE WHEN r = -1 THEN n_users END) AS BIGINT) AS n_users,
         |  CAST(MAX(CASE WHEN r = -1 THEN mean_cents END) AS BIGINT) AS point_mean_cents,
         |  CAST(MAX(CASE WHEN r >= 0 AND rn = GREATEST(1, m * 25 // 1000)
         |    THEN mean_cents END) AS BIGINT) AS ci_lo_cents,
         |  CAST(MAX(CASE WHEN r >= 0 AND rn = m + 1 - GREATEST(1, m * 25 // 1000)
         |    THEN mean_cents END) AS BIGINT) AS ci_hi_cents
         |FROM rk""".stripMargin,

    "x_js_divergence" ->
      """WITH t AS (
        |  SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS word
        |  FROM documents),
        |tf AS (SELECT source, word FROM t WHERE length(word) >= 2),
        |st AS (SELECT source, word, count(*) AS c FROM tf GROUP BY source, word),
        |sn AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM st GROUP BY source),
        |ct AS (SELECT word, CAST(SUM(c) AS BIGINT) AS cc FROM st GROUP BY word),
        |cn AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM ct),
        |terms AS (
        |  SELECT st.source,
        |    CAST(FLOOR((
        |      (CAST(st.c AS DOUBLE) / CAST(sn.ns AS DOUBLE))
        |        * ln(CAST(2 * st.c * cn.n AS DOUBLE) / CAST(st.c * cn.n + ct.cc * sn.ns AS DOUBLE))
        |      + (CAST(ct.cc AS DOUBLE) / CAST(cn.n AS DOUBLE))
        |        * ln(CAST(2 * ct.cc * sn.ns AS DOUBLE) / CAST(st.c * cn.n + ct.cc * sn.ns AS DOUBLE))
        |    ) * 1000000000) AS BIGINT) AS nano,
        |    ct.cc AS cc
        |  FROM st JOIN sn ON sn.source = st.source
        |          JOIN ct ON ct.word = st.word CROSS JOIN cn),
        |agg AS (
        |  SELECT source, CAST(SUM(nano) AS BIGINT) AS in_nano,
        |    CAST(SUM(cc) AS BIGINT) AS covered
        |  FROM terms GROUP BY source)
        |SELECT agg.source,
        |  CAST((agg.in_nano
        |    + CAST(FLOOR(ln(CAST(2 AS DOUBLE))
        |        * (CAST(1000000000 AS DOUBLE)
        |           - CAST(1000000000 * agg.covered // cn.n AS DOUBLE))) AS BIGINT)
        |  ) // 2000 AS BIGINT) AS jsd_micro
        |FROM agg CROSS JOIN cn""".stripMargin,

    "x_target_encoding" ->
      s"""WITH e AS (
         |  SELECT event_type,
         |    ${duckH64("('kf_' || user_id)")} % 5 AS fold,
         |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
         |  FROM events),
         |f AS (
         |  SELECT event_type, fold, CAST(SUM(cents) AS BIGINT) AS sc,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM e GROUP BY event_type, fold)
         |SELECT event_type, CAST(fold AS BIGINT) AS fold, n AS fold_rows,
         |  CAST((SUM(sc) OVER (PARTITION BY event_type) - sc)
         |    // NULLIF(SUM(n) OVER (PARTITION BY event_type) - n, 0) AS BIGINT) AS oof_mean_cents
         |FROM f""".stripMargin,

    "x_gram_matrix" ->
      """WITH q AS (
        |  SELECT [CAST(FLOOR(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT) FOR e IN embedding] AS qv
        |  FROM embeddings),
        |x AS (
        |  SELECT r1.i - 1 AS i, r2.j - 1 AS j, q.qv[r1.i] * q.qv[r2.j] AS p
        |  FROM q, range(1, 65) r1(i), range(1, 65) r2(j)
        |  WHERE r1.i <= r2.j)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(SUM(p) AS BIGINT) AS s
        |FROM x GROUP BY i, j""".stripMargin,

    "x_pca_power" ->
      """WITH q AS (
        |  SELECT [CAST(FLOOR(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT) FOR e IN embedding] AS qv
        |  FROM embeddings),
        |x AS (
        |  SELECT r1.i - 1 AS i, r2.j - 1 AS j, q.qv[r1.i] * q.qv[r2.j] AS p
        |  FROM q, range(1, 65) r1(i), range(1, 65) r2(j)),
        |g AS (SELECT i, j, CAST(SUM(p) AS BIGINT) AS s FROM x GROUP BY i, j),
        |gm AS (SELECT CAST(MAX(ABS(s)) AS BIGINT) AS m FROM g),
        |c AS (SELECT i, j, s // ((SELECT m FROM gm) // 1000000 + 1) AS cn FROM g),
        |v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM c),
        |w1 AS (SELECT c.i, CAST(SUM(c.cn * v0.v) AS BIGINT) AS w
        |  FROM c JOIN v0 ON v0.i = c.j GROUP BY c.i),
        |v1 AS (SELECT i, w // ((SELECT MAX(ABS(w)) FROM w1) // 1000000 + 1) AS v FROM w1),
        |w2 AS (SELECT c.i, CAST(SUM(c.cn * v1.v) AS BIGINT) AS w
        |  FROM c JOIN v1 ON v1.i = c.j GROUP BY c.i),
        |v2 AS (SELECT i, w // ((SELECT MAX(ABS(w)) FROM w2) // 1000000 + 1) AS v FROM w2),
        |w3 AS (SELECT c.i, CAST(SUM(c.cn * v2.v) AS BIGINT) AS w
        |  FROM c JOIN v2 ON v2.i = c.j GROUP BY c.i)
        |SELECT CAST(i AS BIGINT) AS i,
        |  CAST(w // ((SELECT MAX(ABS(w)) FROM w3) // 1000000 + 1) AS BIGINT) AS v_micro
        |FROM w3""".stripMargin
  )
}
