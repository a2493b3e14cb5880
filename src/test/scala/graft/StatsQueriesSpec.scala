package graft

import java.sql.Timestamp

/** Closed-form checks for the StatsQueries SQL (the same text the oracle
  * queries run) on hand-built frames where the statistic is known exactly:
  * an exact-fit line for OLS, uniform and maximally-unequal distributions
  * for Gini, an exactly-independent contingency table for chi-square, and
  * a hand-scored seasonal-naive backtest.
  */
class StatsQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 12): Timestamp =
    new Timestamp(java.time.Instant.parse(f"2024-03-${day + 1}%02dT$hour%02d:00:00Z").toEpochMilli)

  private def asEvents(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .createOrReplaceTempView("events")

  test("OLS trend recovers an exact-fit line: y = 100 + 5x dollars over 10 days") {
    // one event per day, value exactly 100 + 5x dollars
    asEvents((0 until 10).map(x => (x.toLong, ts(x), 1L, "buy", 100.0 + 5 * x)))
    val row = spark.sql(StatsQueries.olsTrendSql).collect().head
    assert(row.getAs[Long]("n_days") === 10L)
    assert(row.getAs[Long]("slope_micro_dollars_per_day") === 5000000L)
    assert(row.getAs[Long]("intercept_milli_dollars") === 100000L)
  }

  test("OLS slope is negative for a falling series and exact under truncation") {
    // y = 50 - 3x dollars, 5 days: slope -3, intercept 50
    asEvents((0 until 5).map(x => (x.toLong, ts(x), 1L, "b", 50.0 - 3 * x)))
    val row = spark.sql(StatsQueries.olsTrendSql).collect().head
    assert(row.getAs[Long]("slope_micro_dollars_per_day") === -3000000L)
    assert(row.getAs[Long]("intercept_milli_dollars") === 50000L)
  }

  test("Gini: uniform distribution scores 0; one-user-takes-all scores (n-1)/n") {
    asEvents((1 to 10).map(u => (u.toLong, ts(1), u.toLong, "e", 25.0)))
    assert(spark.sql(StatsQueries.giniSql).collect().head
      .getAs[Long]("gini_permille") === 0L)

    // 9 users with 0, one with everything: G = (n-1)/n = 0.9
    asEvents((1 to 9).map(u => (u.toLong, ts(1), u.toLong, "e", 0.0)) :+
      (10L, ts(1), 10L, "e", 500.0))
    val row = spark.sql(StatsQueries.giniSql).collect().head
    assert(row.getAs[Long]("n_users") === 10L)
    assert(row.getAs[Long]("gini_permille") === 900L)
  }

  test("Gini is tie-order independent: grouped ties equal the textbook rank formula") {
    // users with totals 1,1,2,2,3 dollars -> compute textbook G by sorted ranks
    val cents = Seq(100L, 100L, 200L, 200L, 300L)
    asEvents(cents.zipWithIndex.map { case (c, i) =>
      (i.toLong, ts(1), i.toLong, "e", c / 100.0) })
    val n = cents.size.toLong
    val s = cents.sum
    val rsum = cents.sorted.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    val expected = (2 * rsum - (n + 1) * s) * 1000 / (n * s)
    assert(spark.sql(StatsQueries.giniSql).collect().head
      .getAs[Long]("gini_permille") === expected)
  }

  test("chi-square is 0 on an exactly independent table and positive under dependence") {
    // 2 types x 2 weekdays (Mon=day0 of 2024-03-01? use two fixed days), equal counts:
    // perfectly independent -> every cell d = O*n - rt*ct = 0
    val rows = for {
      t <- Seq("a", "b"); d <- Seq(0, 1); i <- 0 until 5
    } yield ((t + d + i).hashCode.toLong, ts(d), 1L, t, 1.0)
    asEvents(rows)
    val indep = spark.sql(StatsQueries.chiSquareSql).collect().head
    assert(indep.getAs[Long]("chi2_micro") === 0L)
    assert(indep.getAs[Long]("max_cell_micro") === 0L)
    assert(indep.getAs[Long]("dof") === 1L)

    // skew one cell: chi2 must rise above zero
    asEvents(rows ++ Seq((999L, ts(0), 1L, "a", 1.0), (998L, ts(0), 1L, "a", 1.0)))
    val dep = spark.sql(StatsQueries.chiSquareSql).collect().head
    assert(dep.getAs[Long]("chi2_micro") > 0L)
    assert(dep.getAs[Long]("n_events") === rows.size + 2L)
  }

  test("seasonal-naive backtest scores exactly the hand-aligned days") {
    // daily revenue (cents): days 0..13, y = 1000 + 100*day
    // predictions exist for days 7..13: yhat = y(day-7), err = 700 cents each
    asEvents((0 until 14).map(d => (d.toLong, ts(d), 1L, "buy", (1000 + 100 * d) / 100.0)))
    val row = spark.sql(StatsQueries.forecastBacktestSql).collect().head
    assert(row.getAs[Long]("n_scored") === 7L)
    assert(row.getAs[Long]("mae_cents") === 700L)
    // sum(y) over scored days = sum_{d=7..13} (1000+100d) = 7000 + 100*70 = 14000
    assert(row.getAs[Long]("wape_permille") === 700L * 7 * 1000 / 14000)
    // actuals grow, so predictions undershoot: bias = sum(y - yhat) = +4900
    assert(row.getAs[Long]("bias_cents") === 4900L)
  }

  test("seasonal-naive backtest skips gap days without a 7-day-prior observation") {
    // type with days 0, 7, 8: only day 7 scores (day 8 lacks day 1)
    asEvents(Seq(
      (0L, ts(0), 1L, "g", 10.0), (1L, ts(7), 1L, "g", 12.0), (2L, ts(8), 1L, "g", 9.0)))
    val row = spark.sql(StatsQueries.forecastBacktestSql).collect().head
    assert(row.getAs[Long]("n_scored") === 1L)
    assert(row.getAs[Long]("mae_cents") === 200L)
    assert(row.getAs[Long]("bias_cents") === 200L)
  }
}
