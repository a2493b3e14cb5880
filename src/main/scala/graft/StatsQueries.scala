package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statistical-modeling and ML-evaluation operators over the event
  * stream: trend estimation, inequality/association measures, and
  * forecast backtesting — the read-side analytics a feature/metrics
  * pipeline runs after ingestion (reference scope: the aggregation +
  * window surface of sanpshot_script.py / incremental_kafka_s3_cdc.py,
  * re-expressed as declarative Spark SQL; every query here is one scan
  * plus combine-friendly hash aggregates).
  *
  * Cross-engine determinism: every statistic is computed from EXACT
  * integer moments (counts, cents sums, cross-products) and quantized by
  * integer division — or, where a closed form genuinely needs floating
  * point (chi-square's 1/E weights), by single correctly-rounded IEEE
  * divisions of exact integers with textually identical expressions in
  * both engines (the x_ab_test / x_ab_cuped discipline). Signed integer
  * division truncates toward zero identically in Spark (`DIV`) and
  * DuckDB (`//`) — negative numerators (slopes, biases) are safe.
  *
  * The Spark-side SQL lives in named constants so `StatsQueriesSpec` can
  * run the identical text against hand-built frames with known closed-form
  * answers (zero-Gini uniformity, exact-fit OLS, independent chi-square).
  */
object StatsQueries extends QueryPack {

  private def events(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables(s, dir, "events").createOrReplaceTempView("events")
    s.sql(sql)
  }

  /** OLS linear trend of daily revenue per event type: slope/intercept in
    * closed form from five exact integer moments (n, Σx, Σy, Σxy, Σx²)
    * over the (type × day) roll-up — never a per-row regression library.
    * x is the day offset from the type's first active day (bounds the
    * cross-products: x ≤ span days), y is daily revenue in whole dollars.
    * One combine-friendly groupBy on (type, day), one window for the
    * per-type day origin, one type-bounded final aggregate.
    */
  private[graft] val olsTrendSql: String =
    """WITH d AS (
      |  SELECT event_type, unix_micros(ts) DIV 86400000000 AS day,
      |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) DIV 100 AS BIGINT) AS y
      |  FROM events GROUP BY event_type, unix_micros(ts) DIV 86400000000),
      |m AS (SELECT event_type,
      |    CAST(day - min(day) OVER (PARTITION BY event_type) AS BIGINT) AS x, y
      |  FROM d),
      |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM m GROUP BY event_type)
      |SELECT event_type, n AS n_days,
      |  CAST((n * sxy - sx * sy) * 1000000 DIV (n * sxx - sx * sx) AS BIGINT) AS slope_micro_dollars_per_day,
      |  CAST((sy * sxx - sx * sxy) * 1000 DIV (n * sxx - sx * sx) AS BIGINT) AS intercept_milli_dollars
      |FROM a""".stripMargin

  /** Gini coefficient of per-user revenue: the single-number inequality
    * audit behind the Lorenz shares in x_concentration_share. The rank
    * sum Σ rn·x comes from the VALUE-GROUPED distribution (ranks inside a
    * tie block always sum to c·cumprev + c(c+1)/2 regardless of intra-tie
    * order, so the statistic is exact without ever ranking users):
    * windows run over distinct user-total values, never events or users.
    */
  private[graft] val giniSql: String =
    """WITH u AS (SELECT user_id,
      |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY user_id),
      |v AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY x),
      |w AS (SELECT x, c,
      |    CAST(SUM(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cend
      |  FROM v),
      |r AS (SELECT
      |    CAST(SUM(x * (c * (cend - c) + (c * (c + 1)) DIV 2)) AS BIGINT) AS rsum,
      |    CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(x * c) AS BIGINT) AS s
      |  FROM w)
      |SELECT n AS n_users, s AS total_cents,
      |  CAST((2 * rsum - (n + 1) * s) * 1000 DIV (n * s) AS BIGINT) AS gini_permille
      |FROM r""".stripMargin

  /** Chi-square test of independence over the event_type × ISO-weekday
    * contingency table — "does traffic mix shift by weekday". Row/col
    * totals ride windows over the ≤ |types|·7 cell table; each cell's
    * contribution (O−E)²/E is computed from the exact integer deviation
    * d = O·n − rt·ct as (d/(rt·ct))·(d/n)·1e6 — two correctly-rounded
    * IEEE divisions of exact BIGINTs, floored to integer micro-units so
    * the final SUM is order-independent. Single CTE chain, one scan.
    */
  private[graft] val chiSquareSql: String =
    """WITH e AS (SELECT event_type, weekday(ts) + 1 AS dow FROM events),
      |o AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS obs
      |      FROM e GROUP BY event_type, dow),
      |m AS (SELECT event_type, dow, obs,
      |    CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
      |    CAST(SUM(obs) OVER (PARTITION BY dow) AS BIGINT) AS ct,
      |    CAST(SUM(obs) OVER () AS BIGINT) AS n
      |  FROM o),
      |c AS (SELECT event_type, dow, n,
      |    CAST(FLOOR((CAST(obs * n - rt * ct AS DOUBLE) / CAST(rt * ct AS DOUBLE))
      |      * (CAST(obs * n - rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS contrib_micro
      |  FROM m)
      |SELECT CAST(max(n) AS BIGINT) AS n_events, CAST(count(*) AS BIGINT) AS n_cells,
      |  CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
      |  CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro,
      |  CAST(max(contrib_micro) AS BIGINT) AS max_cell_micro
      |FROM c""".stripMargin

  /** Seasonal-naive forecast backtest: predict each day's per-type
    * revenue with the value 7 days earlier, score MAE / WAPE / signed
    * bias — the sanity baseline every forecasting pipeline reports before
    * shipping a model. The actual-vs-prediction alignment comes from
    * exploding each daily row into its (day, actual) and (day+7,
    * prediction) ledger entries and re-grouping — NOT a self-join of the
    * daily CTE, which would make Catalyst execute the events roll-up
    * twice (see the CTE-inlining notes on x_sankey_paths). Only days with
    * both entries score.
    */
  private[graft] val forecastBacktestSql: String =
    """WITH d AS (
      |  SELECT event_type, unix_micros(ts) DIV 86400000000 AS day,
      |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY event_type, unix_micros(ts) DIV 86400000000),
      |x AS (SELECT event_type, day + i * 7 AS sday,
      |    CASE WHEN i = 0 THEN y END AS ya, CASE WHEN i = 1 THEN y END AS yh
      |  FROM d LATERAL VIEW explode(array(0, 1)) t AS i),
      |g AS (SELECT event_type, sday, max(ya) AS y, max(yh) AS yhat
      |      FROM x GROUP BY event_type, sday),
      |j AS (SELECT * FROM g WHERE y IS NOT NULL AND yhat IS NOT NULL)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
      |  CAST(SUM(abs(y - yhat)) DIV count(*) AS BIGINT) AS mae_cents,
      |  CAST(SUM(abs(y - yhat)) * 1000 DIV SUM(y) AS BIGINT) AS wape_permille,
      |  CAST(SUM(y - yhat) AS BIGINT) AS bias_cents
      |FROM j GROUP BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_ols_trend" -> ((s, dir) => events(s, dir, olsTrendSql)),
    "x_gini" -> ((s, dir) => events(s, dir, giniSql)),
    "x_chi_square" -> ((s, dir) => events(s, dir, chiSquareSql)),
    "x_forecast_backtest" -> ((s, dir) => events(s, dir, forecastBacktestSql))
  )

  def oracle: Map[String, String] = Map(

    "x_ols_trend" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) // 100 AS BIGINT) AS y
        |  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000),
        |m AS (SELECT event_type,
        |    CAST(day - min(day) OVER (PARTITION BY event_type) AS BIGINT) AS x, y
        |  FROM d),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM m GROUP BY event_type)
        |SELECT event_type, n AS n_days,
        |  CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS BIGINT) AS slope_micro_dollars_per_day,
        |  CAST((sy * sxx - sx * sxy) * 1000 // (n * sxx - sx * sx) AS BIGINT) AS intercept_milli_dollars
        |FROM a""".stripMargin,

    "x_gini" ->
      """WITH u AS (SELECT user_id,
        |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY user_id),
        |v AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY x),
        |w AS (SELECT x, c,
        |    CAST(SUM(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cend
        |  FROM v),
        |r AS (SELECT
        |    CAST(SUM(x * (c * (cend - c) + (c * (c + 1)) // 2)) AS BIGINT) AS rsum,
        |    CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(x * c) AS BIGINT) AS s
        |  FROM w)
        |SELECT n AS n_users, s AS total_cents,
        |  CAST((2 * rsum - (n + 1) * s) * 1000 // (n * s) AS BIGINT) AS gini_permille
        |FROM r""".stripMargin,

    "x_chi_square" ->
      """WITH e AS (SELECT event_type, isodow(ts) AS dow FROM events),
        |o AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS obs
        |      FROM e GROUP BY event_type, dow),
        |m AS (SELECT event_type, dow, obs,
        |    CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
        |    CAST(SUM(obs) OVER (PARTITION BY dow) AS BIGINT) AS ct,
        |    CAST(SUM(obs) OVER () AS BIGINT) AS n
        |  FROM o),
        |c AS (SELECT event_type, dow, n,
        |    CAST(FLOOR((CAST(obs * n - rt * ct AS DOUBLE) / CAST(rt * ct AS DOUBLE))
        |      * (CAST(obs * n - rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS contrib_micro
        |  FROM m)
        |SELECT CAST(max(n) AS BIGINT) AS n_events, CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
        |  CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro,
        |  CAST(max(contrib_micro) AS BIGINT) AS max_cell_micro
        |FROM c""".stripMargin,

    "x_forecast_backtest" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000),
        |x AS (SELECT event_type, day + i * 7 AS sday,
        |    CASE WHEN i = 0 THEN y END AS ya, CASE WHEN i = 1 THEN y END AS yh
        |  FROM d CROSS JOIN (SELECT unnest([0, 1]) AS i) t),
        |g AS (SELECT event_type, sday, max(ya) AS y, max(yh) AS yhat
        |      FROM x GROUP BY event_type, sday),
        |j AS (SELECT * FROM g WHERE y IS NOT NULL AND yhat IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
        |  CAST(SUM(abs(y - yhat)) // count(*) AS BIGINT) AS mae_cents,
        |  CAST(SUM(abs(y - yhat)) * 1000 // SUM(y) AS BIGINT) AS wape_permille,
        |  CAST(SUM(y - yhat) AS BIGINT) AS bias_cents
        |FROM j GROUP BY event_type""".stripMargin
  )
}
