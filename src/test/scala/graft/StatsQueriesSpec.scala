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

  test("autocorrelation: alternating series lag-1 negative, period-2 lag-7 signs; constant NULL") {
    // 14 days alternating 10/50 dollars: lag-1 strongly negative,
    // lag-7 (odd lag over a period-2 signal) also negative
    asEvents((0 until 14).map(d =>
      (d.toLong, ts(d), 1L, "alt", if (d % 2 == 0) 10.0 else 50.0)) ++
      (0 until 14).map(d => (100L + d, ts(d), 1L, "flat", 25.0)))
    val rows = spark.sql(StatsQueries.autocorrSql).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag_days")) ->
        Option(r.get(r.fieldIndex("autocorr_micro")).asInstanceOf[java.lang.Long]))
      .toMap
    assert(rows(("alt", 1L)).get < -900000L)
    assert(rows(("alt", 7L)).get < -900000L)
    assert(rows(("flat", 1L)).isEmpty, "constant series must yield NULL, not a division blow-up")
    // exactly periodic with period 7: lag-7 autocorrelation is +1 (floored)
    asEvents((0 until 21).map(d => (d.toLong, ts(d), 1L, "p7", 10.0 + (d % 7))))
    val p7 = spark.sql(StatsQueries.autocorrSql).collect()
      .map(r => r.getAs[Long]("lag_days") -> r.getAs[Long]("autocorr_micro")).toMap
    assert(p7(7L) === 1000000L)
  }

  test("survival hazard: conversions, censoring, and pre-signup purchases excluded") {
    // corpus end = day 20 (user E's last event pins max ts)
    // A: signup d0, big purchase d3            -> converted, dur 3
    // B: signup d0, only small purchases       -> censored, dur 20
    // C: signup d5, big purchase d5 (later hr) -> converted, dur 0
    // D: big purchase d1 BEFORE signup d2      -> censored, dur 18
    // E: no signup                             -> excluded entirely
    asEvents(Seq(
      (1L, ts(0), 1L, "signup", 0.0), (2L, ts(3), 1L, "purchase", 250.0),
      (3L, ts(0), 2L, "signup", 0.0), (4L, ts(4), 2L, "purchase", 50.0),
      (5L, ts(5, 8), 3L, "signup", 0.0), (6L, ts(5, 20), 3L, "purchase", 300.0),
      (7L, ts(1), 4L, "purchase", 999.0), (8L, ts(2), 4L, "signup", 0.0),
      (9L, ts(20), 5L, "purchase", 400.0)))
    val rows = spark.sql(StatsQueries.survivalHazardSql).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("at_risk"), r.getAs[Long]("converted"), r.getAs[Long]("censored")))
      .toMap
    assert(rows.keySet === Set(0L, 3L, 18L, 20L))
    assert(rows(0L) === ((4L, 1L, 0L)))   // C converts same-day, everyone at risk
    assert(rows(3L) === ((3L, 1L, 0L)))   // A converts day 3
    assert(rows(18L) === ((2L, 0L, 1L)))  // D censored (pre-signup purchase ignored)
    assert(rows(20L) === ((1L, 0L, 1L)))  // B censored at corpus end
  }

  test("triangle count: support-2 threshold prunes noise edges; one triangle found") {
    // parts 1-2-3 pairwise co-occur in 2 orders -> a triangle;
    // parts 3-4 co-occur once -> below support, pruned
    Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 3L), (12L, 4L))
      .toDF("l_orderkey", "l_partkey").createOrReplaceTempView("lineitem")
    spark.sql("SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")
      .createOrReplaceTempView("mb_li")
    spark.sql(StatsQueries.triEdgeSql).localCheckpoint().createOrReplaceTempView("tri_e")
    val row = spark.sql(StatsQueries.triangleSql).collect().head
    assert(row.getAs[Long]("n_nodes") === 3L)
    assert(row.getAs[Long]("n_edges") === 3L)
    assert(row.getAs[Long]("n_triangles") === 1L)
    assert(row.getAs[Long]("n_wedges") === 3L)
    assert(row.getAs[Long]("closure_permille") === 1000L)
  }

  test("triangle count: open wedge yields zero triangles and closure 0") {
    // path 1-2-3 (each edge supported twice), no 1-3 edge
    Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
        (12L, 2L), (12L, 3L), (13L, 2L), (13L, 3L))
      .toDF("l_orderkey", "l_partkey").createOrReplaceTempView("lineitem")
    spark.sql("SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")
      .createOrReplaceTempView("mb_li")
    spark.sql(StatsQueries.triEdgeSql).localCheckpoint().createOrReplaceTempView("tri_e")
    val row = spark.sql(StatsQueries.triangleSql).collect().head
    assert(row.getAs[Long]("n_triangles") === 0L)
    assert(row.getAs[Long]("n_wedges") === 1L)
    assert(row.getAs[Long]("closure_permille") === 0L)
  }

  test("AUC: perfect separation 1.0, reversed 0.0, constant score 0.5 (midrank ties)") {
    def auc(userScores: Seq[(Long, Int, Boolean)]): Long = {
      // (user, clicks, converts)
      asEvents(userScores.flatMap { case (u, clicks, conv) =>
        (0 until clicks).map(i => (u * 100 + i, ts(1), u, "click", 0.0)) ++
          (if (conv) Seq((u * 100 + 99, ts(2), u, "purchase", 500.0)) else
            Seq((u * 100 + 99, ts(2), u, "view", 0.0)))
      })
      spark.sql(StatsQueries.aucSql).collect().head.getAs[Long]("auc_micro")
    }
    assert(auc(Seq((1L, 1, false), (2L, 2, false), (3L, 3, true), (4L, 4, true))) === 1000000L)
    assert(auc(Seq((1L, 1, true), (2L, 2, true), (3L, 3, false), (4L, 4, false))) === 0L)
    assert(auc(Seq((1L, 2, true), (2L, 2, true), (3L, 2, false), (4L, 2, false))) === 500000L)
  }

  test("inter-arrival percentiles pick the exact order statistics of hand gaps") {
    // one user, one type, events at minutes 0, 10, 30, 60, 160 -> gaps 10,20,30,100
    val mins = Seq(0, 10, 30, 60, 160)
    asEvents(mins.zipWithIndex.map { case (m, i) =>
      (i.toLong, new Timestamp(java.time.Instant.parse("2024-03-01T00:00:00Z")
        .plusSeconds(m * 60L).toEpochMilli), 1L, "e", 0.0) })
    val rows = spark.sql(StatsQueries.interarrivalSql).collect()
      .map(r => r.getAs[Long]("p") -> r.getAs[Long]("gap_minutes")).toMap
    // n=4 gaps; k(p) = ((n-1)p) DIV 100 + 1 -> p50: 2nd=20, p90: 3rd=30, p99: 3rd=30
    assert(rows === Map(50L -> 20L, 90L -> 30L, 99L -> 30L))
  }

  test("centroid drift: identical slices cosine 1, orthogonal slices cosine 0") {
    def drift(vecs: Seq[(Long, Array[Float])]): (Long, Long) = {
      vecs.toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")
      val r = spark.sql(StatsQueries.centroidDriftSql).collect().head
      (r.getAs[Long]("centroid_cosine_micro"), r.getAs[Long]("max_dim_shift_micro"))
    }
    // both slices centroid [3,4]: |sum|=5000 exactly, cosine exactly 1
    val (c1, s1) = drift(Seq((0L, Array(3f, 4f)), (1L, Array(3f, 4f))))
    assert(c1 === 1000000L); assert(s1 === 0L)
    val (c0, s0) = drift(Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f))))
    assert(c0 === 0L); assert(s0 === 1000000L)
  }

  test("skip-gram pairs: window ±2 emits exactly the directed pairs of 'a b c d'") {
    Seq((1L, "a b c d")).toDF("doc_id", "text").createOrReplaceTempView("documents")
    val rows = spark.sql(StatsQueries.skipgramSql).collect()
      .map(r => (r.getAs[String]("center"), r.getAs[String]("context")) -> r.getAs[Long]("cnt"))
      .toMap
    val want = Seq("a" -> "b", "a" -> "c", "b" -> "a", "b" -> "c", "b" -> "d",
      "c" -> "a", "c" -> "b", "c" -> "d", "d" -> "b", "d" -> "c")
    assert(rows.keySet === want.toSet)
    assert(rows.values.forall(_ === 1L))
  }

  test("lift deciles: distinct scores split evenly; top deciles carry all lift") {
    // 10 users, score = user id (1..10 clicks), converters = top two scores
    asEvents((1 to 10).flatMap { u =>
      (0 until u).map(i => (u * 100L + i, ts(1), u.toLong, "click", 0.0)) ++
        (if (u >= 9) Seq((u * 100L + 99, ts(2), u.toLong, "purchase", 500.0)) else Nil)
    })
    val rows = spark.sql(StatsQueries.liftDecilesSql).collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_conv"),
         r.getAs[Long]("lift_permille"), r.getAs[Long]("cum_conv_share_permille")))
      .toMap
    assert(rows.size === 10)
    assert(rows(9L) === ((1L, 1L, 5000L, 500L)))   // top decile: 5x base rate, half the converters
    assert(rows(8L) === ((1L, 1L, 5000L, 1000L)))  // top two deciles capture everyone
    assert(rows(0L)._2 === 0L)
    assert(rows(0L)._4 === 1000L)                  // cumulative share saturates
  }

  test("vocab coverage: cumulative share of top-k words over a hand corpus") {
    Seq((1L, "a a a b b c")).toDF("doc_id", "text").createOrReplaceTempView("documents")
    val rows = spark.sql(StatsQueries.vocabCoverageSql).collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[String]("kth_word"), r.getAs[Long]("coverage_permille")))
      .toMap
    assert(rows === Map(1L -> (("a", 500L)), 2L -> (("b", 833L))))
  }

  test("feature MI: constant label scores zero for every feature; dependence ranks above") {
    // all events are big purchases -> label constant -> MI exactly 0
    asEvents((0 until 20).map(i => (i.toLong, ts(i % 5), i.toLong, "purchase", 300.0)))
    val zeros = spark.sql(StatsQueries.featureMiSql).collect()
    assert(zeros.forall(_.getAs[Long]("mi_micro") === 0L))

    // conversion happens only on one weekday -> weekday MI strictly positive
    // and at least the daypart MI (all events share one hour -> daypart is constant)
    asEvents((0 until 14).map { i =>
      val big = i % 7 == 0
      (i.toLong, ts(i), i.toLong, "purchase", if (big) 300.0 else 10.0)
    })
    val mi = spark.sql(StatsQueries.featureMiSql).collect()
      .map(r => r.getAs[String]("feature") -> r.getAs[Long]("mi_micro")).toMap
    assert(mi("weekday") > 0L)
    assert(mi("daypart6h") === 0L, "constant daypart must carry zero information")
  }

  test("PSI: identical half distributions score zero; a shifted half scores positive") {
    // days 0 and 2 (split point = day 1): identical value multisets -> PSI 0
    val base = Seq(1.0, 1.0, 5.0, 10.0, 10.0, 10.0)
    asEvents(base.zipWithIndex.map { case (v, i) => (i.toLong, ts(0), 1L, "e", v) } ++
      base.zipWithIndex.map { case (v, i) => (100L + i, ts(2), 1L, "e", v) })
    val zero = spark.sql(StatsQueries.psiSql).collect().head
    assert(zero.getAs[Long]("psi_micro") === 0L)
    assert(zero.getAs[Long]("n_buckets") === 10L)

    // second half shifted to the top bucket -> PSI strictly positive
    asEvents(base.zipWithIndex.map { case (v, i) => (i.toLong, ts(0), 1L, "e", v) } ++
      base.zipWithIndex.map { case (_, i) => (100L + i, ts(2), 1L, "e", 10.0) })
    assert(spark.sql(StatsQueries.psiSql).collect().head.getAs[Long]("psi_micro") > 0L)
  }

  test("doc novelty: duplicated docs score 0, a unique doc scores 1000") {
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      (2L, "alpha beta gamma delta epsilon zeta", "en"),
      (3L, "one two three four five six seven", "fr"))
      .toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
    Tables.cacheView("novelty_sh", spark.sql(StatsQueries.noveltyShinglesSql))
    val rows = spark.sql(StatsQueries.docNoveltySql).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("mean_novelty_permille"), r.getAs[Long]("n_low_novelty")))
      .toMap
    assert(rows("en") === ((2L, 0L, 2L)))
    assert(rows("fr") === ((1L, 1000L, 0L)))
  }

  test("shard rebalance: rendezvous hashing moves ~1/17 of keys, modulo moves ~16/17") {
    asEvents((1 to 400).map(u => (u.toLong, ts(1), u.toLong, "e", 1.0)))
    val r = spark.sql(StatsQueries.shardRebalanceSql).collect().head
    assert(r.getAs[Long]("n_keys") === 400L)
    val hrw = r.getAs[Long]("hrw_moved_permille")
    val mod = r.getAs[Long]("mod_moved_permille")
    assert(hrw < 200L, s"HRW movement should approximate 1/17 ≈ 59‰, saw $hrw")
    assert(mod > 800L, s"modulo movement should approximate 16/17 ≈ 941‰, saw $mod")
    assert(r.getAs[Long]("hrw_moved") > 0L, "some keys must still move under HRW")
  }

  test("Wilson CI brackets the point estimate and widens with smaller n") {
    // same 50% rate at n=1000 and n=10: both intervals contain 0.5,
    // and the small-sample band is strictly wider
    asEvents(
      (0 until 1000).map(i => (i.toLong, ts(1), 1L, "big_n", if (i < 500) 150.0 else 1.0)) ++
      (0 until 10).map(i => (5000L + i, ts(1), 2L, "small_n", if (i < 5) 150.0 else 1.0)))
    val rows = spark.sql(StatsQueries.wilsonCiSql).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("ci_low_micro"), r.getAs[Long]("ci_high_micro"))).toMap
    val (bl, bh) = rows("big_n"); val (sl, sh) = rows("small_n")
    assert(bl < 500000L && 500000L < bh)
    assert(sl < 500000L && 500000L < sh)
    assert(sl < bl && bh < sh, "small-sample interval must be strictly wider")
    assert(bh - bl < 70000L, "n=1000 at p=.5 has a ±3.1% Wilson band")
  }

  test("doc similarity: duplicated docs pair at jaccard 1000; singleton shingles never pair") {
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text").createOrReplaceTempView("documents")
    Tables.cacheView("rare_postings", spark.sql(StatsQueries.rarePostingsSql))
    val rows = spark.sql(StatsQueries.docSimTopSql).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("d1") === 1L)
    assert(rows.head.getAs[Long]("d2") === 2L)
    assert(rows.head.getAs[Long]("jaccard_permille") === 1000L)
  }
}
