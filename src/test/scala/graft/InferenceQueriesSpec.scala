package graft

import java.sql.Timestamp

/** Closed-form checks for the InferenceQueries SQL (the same text the
  * oracle queries run) on hand-built frames where the statistic is known
  * exactly: a constant-revenue population for the bootstrap (every
  * replica mean equals the population mean, so the CI collapses to a
  * point), identical / disjoint term distributions for JSD (zero /
  * hand-computed positive), a hash-replayed fold layout for target
  * encoding, and axis-aligned embeddings for the Gram matrix and the
  * power-iteration eigenvector.
  */
class InferenceQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = new Timestamp(1700000000000L)

  /** Scala twin of TextQueries.h64 — md5 hex prefix as a 60-bit long,
    * for replaying fold assignment in expectations.
    */
  private def h64(x: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def asEvents(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .createOrReplaceTempView("events")

  private def asDocs(rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "source", "text").createOrReplaceTempView("documents")

  private def asEmbeddings(rows: Seq[(Long, Array[Float])]): Unit =
    rows.toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")

  test("bootstrap CI collapses to a point on a constant-revenue population") {
    // 20 users, each exactly $3.00 — every replica's weighted mean is 300
    // cents whatever the Poisson weights (as long as any weight is > 0).
    asEvents((1 to 20).map(u => (u.toLong, t0, u.toLong, "buy", 3.0)))
    spark.sql(InferenceQueries.bootstrapUserSql).createOrReplaceTempView("bs_u")
    val row = spark.sql(InferenceQueries.bootstrapSql).collect().head
    assert(row.getAs[Long]("n_users") === 20L)
    assert(row.getAs[Long]("point_mean_cents") === 300L)
    assert(row.getAs[Long]("ci_lo_cents") === 300L)
    assert(row.getAs[Long]("ci_hi_cents") === 300L)
  }

  test("bootstrap CI brackets the point estimate on a mixed population") {
    // users 1..40 with revenue u dollars: the replica means vary, the CI
    // must contain the point mean and be ordered.
    asEvents((1 to 40).map(u => (u.toLong, t0, u.toLong, "buy", u.toDouble)))
    spark.sql(InferenceQueries.bootstrapUserSql).createOrReplaceTempView("bs_u")
    val row = spark.sql(InferenceQueries.bootstrapSql).collect().head
    val (p, lo, hi) = (row.getAs[Long]("point_mean_cents"),
      row.getAs[Long]("ci_lo_cents"), row.getAs[Long]("ci_hi_cents"))
    assert(lo < hi, s"degenerate CI [$lo, $hi]")
    assert(lo <= p && p <= hi, s"point $p outside [$lo, $hi]")
  }

  test("JSD is zero when every source matches the corpus distribution") {
    // two sources with IDENTICAL term distributions — each equals the
    // corpus mixture, so both divergences are exactly zero.
    asDocs(Seq((1L, "a", "xx yy"), (2L, "b", "xx yy")))
    spark.sql(InferenceQueries.jsTermCountsSql).createOrReplaceTempView("js_st")
    val rows = spark.sql(InferenceQueries.jsDivergenceRankSql).collect()
    assert(rows.length === 2)
    rows.foreach(r => assert(r.getAs[Long]("jsd_micro") === 0L))
  }

  test("JSD of disjoint-vocabulary halves matches the hand computation") {
    // source a: 'aa' x2; source b: 'bb' x2 — NA=2, N=4, and for each
    // source's one term c=2, cc=2, ns=2, n=4. Replay the query's exact
    // quantization: per-term nano floor, closed-form ln2 tail, DIV 2000.
    asDocs(Seq((1L, "a", "aa aa"), (2L, "b", "bb bb")))
    val nano = math.floor((
      (2.0 / 2.0) * math.log((2.0 * 2 * 4) / (2.0 * 4 + 2.0 * 2))
        + (2.0 / 4.0) * math.log((2.0 * 2 * 2) / (2.0 * 4 + 2.0 * 2))
      ) * 1e9).toLong
    val tail = math.floor(math.log(2.0) * (1e9 - (1000000000L * 2 / 4))).toLong
    val expected = (nano + tail) / 2000
    spark.sql(InferenceQueries.jsTermCountsSql).createOrReplaceTempView("js_st")
    val rows = spark.sql(InferenceQueries.jsDivergenceRankSql).collect()
    assert(rows.length === 2)
    rows.foreach(r => assert(r.getAs[Long]("jsd_micro") === expected))
    assert(expected > 0L)
  }

  test("target encoding: out-of-fold mean excludes exactly the cell's own fold") {
    // 10 users with value = $1.00 + fold dollars, so each user's cents
    // depend only on their fold; the OOF mean for fold k is the mean of
    // cents over users NOT in fold k — replayed from the same h64 rule.
    val users = (1L to 10L)
    def fold(u: Long): Long = h64(s"kf_$u") % 5
    asEvents(users.map(u => (u, t0, u, "buy", 1.0 + fold(u))).toSeq)
    val byFold = users.groupBy(fold).view.mapValues(_.size).toMap
    val totalCents = users.map(u => 100L + 100L * fold(u)).sum
    val rows = spark.sql(InferenceQueries.targetEncodingSql).collect()
    rows.foreach { r =>
      val k = r.getAs[Long]("fold")
      val n = byFold(k).toLong
      val cellCents = n * (100L + 100L * k)
      assert(r.getAs[Long]("fold_rows") === n)
      assert(r.getAs[Long]("oof_mean_cents") ===
        (totalCents - cellCents) / (users.size - n))
    }
    assert(rows.map(_.getAs[Long]("fold")).toSet === byFold.keySet)
  }

  test("Gram matrix is exact on axis-aligned vectors") {
    // e1 = 1e6·axis0, e2 = 5e5·(axis0+axis1) after micro-quantization:
    // G(0,0) = 1e12 + 2.5e11, G(0,1) = G(1,1) = 2.5e11, all else 0.
    val d = 64
    val e1 = Array.tabulate(d)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(d)(i => if (i <= 1) 0.5f else 0.0f)
    asEmbeddings(Seq((1L, e1), (2L, e2)))
    val g = spark.sql(InferenceQueries.gramMatrixSql).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r.getAs[Long]("s"))
      .toMap
    assert(g.size === d * (d + 1) / 2)
    assert(g((0L, 0L)) === 1000000000000L + 250000000000L)
    assert(g((0L, 1L)) === 250000000000L)
    assert(g((1L, 1L)) === 250000000000L)
    assert(g((2L, 2L)) === 0L)
    assert(g((0L, 5L)) === 0L)
  }

  test("power iteration recovers the dominant axis") {
    // all mass on axis 0: the eigenvector is axis 0 — v_micro(0) at the
    // max-norm scale (within the integer-rescale rounding), all else 0.
    val d = 64
    val e1 = Array.tabulate(d)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(d)(i => if (i == 0) 0.5f else 0.0f)
    asEmbeddings(Seq((1L, e1), (2L, e2)))
    val v = InferenceQueries.overGram(spark, InferenceQueries.pcaPowerSql).collect()
      .map(r => r.getAs[Long]("i") -> r.getAs[Long]("v_micro")).toMap
    assert(v.size === d)
    assert(v(0L) > 999000L && v(0L) <= 1000000L, s"v(0) = ${v(0L)}")
    (1 until d).foreach(i => assert(v(i.toLong) === 0L))
  }

  test("conformal: a perfect model gives qhat 0 and full coverage") {
    // every event of a type has the same value — scores are all 0 on
    // calibration AND test, so the interval is a point with coverage 1000
    asEvents((1 to 90).map(i =>
      (i.toLong, t0, i.toLong, if (i % 2 == 0) "a" else "b",
        if (i % 2 == 0) 5.0 else 9.0)))
    val row = spark.sql(InferenceQueries.conformalSql).collect().head
    assert(row.getAs[Long]("qhat_cents") === 0L)
    assert(row.getAs[Long]("coverage_permille") === 1000L)
    assert(row.getAs[Long]("n_cal") + row.getAs[Long]("n_test") <= 90L)
  }

  test("conformal: coverage lands near the 90% target on noisy data") {
    // values u % 7 dollars around a per-type model: the calibration
    // quantile must cover ~90% of test scores by construction
    asEvents((1 to 600).map(i =>
      (i.toLong, t0, i.toLong, "e", 10.0 + (i % 7))))
    val row = spark.sql(InferenceQueries.conformalSql).collect().head
    val cov = row.getAs[Long]("coverage_permille")
    assert(cov >= 850L && cov <= 1000L, s"coverage $cov far from the 900 target")
  }

  test("bootstrap median collapses to a point on a constant population") {
    asEvents((1 to 25).map(u => (u.toLong, t0, u.toLong, "buy", 7.0)))
    spark.sql(InferenceQueries.bootstrapUserSql).createOrReplaceTempView("bs_u")
    val row = spark.sql(InferenceQueries.bootstrapMedianSql).collect().head
    assert(row.getAs[Long]("point_median_cents") === 700L)
    assert(row.getAs[Long]("ci_lo_cents") === 700L)
    assert(row.getAs[Long]("ci_hi_cents") === 700L)
  }

  test("bootstrap median CI brackets the exact median on a spread population") {
    asEvents((1 to 41).map(u => (u.toLong, t0, u.toLong, "buy", u.toDouble)))
    spark.sql(InferenceQueries.bootstrapUserSql).createOrReplaceTempView("bs_u")
    val row = spark.sql(InferenceQueries.bootstrapMedianSql).collect().head
    // 41 users with totals 100..4100: the exact (lower) median is user 21
    assert(row.getAs[Long]("point_median_cents") === 2100L)
    val (lo, hi) = (row.getAs[Long]("ci_lo_cents"), row.getAs[Long]("ci_hi_cents"))
    assert(lo <= 2100L && 2100L <= hi && lo < hi)
  }

  test("DiD recovers an injected treatment effect exactly") {
    // control: 10 pre + 10 post at $10; treated: 10 pre at $10, 10 post
    // at $13 — DiD = +$3.00 exactly (all cells constant)
    val pre = new Timestamp(1700000000000L)
    val post = new Timestamp(1700000800000L)
    def fold(u: Long) = h64(s"did_$u") % 2
    val users = (1L to 40L)
    val treated = users.filter(fold(_) == 1)
    val control = users.filter(fold(_) == 0)
    assert(treated.nonEmpty && control.nonEmpty)
    val rows = users.flatMap { u =>
      val postVal = if (fold(u) == 1) 13.0 else 10.0
      Seq((u * 10 + 1, pre, u, "e", 10.0), (u * 10 + 2, post, u, "e", postVal))
    }
    asEvents(rows.toSeq)
    val r = spark.sql(InferenceQueries.didSql).collect().head
    assert(r.getAs[Long]("m_t_pre") === 1000L * 1000000L)
    assert(r.getAs[Long]("m_t_post") === 1300L * 1000000L)
    assert(r.getAs[Long]("m_c_pre") === 1000L * 1000000L)
    assert(r.getAs[Long]("m_c_post") === 1000L * 1000000L)
    assert(r.getAs[Long]("did_microcents") === 300L * 1000000L)
  }

  test("IPW recovers a zero effect under confounding where the naive gap is biased") {
    // outcome depends ONLY on the confounder (daypart): y = 10 + 10·dp
    // dollars. The assignment rate rises with daypart, so the naive
    // treated-minus-control gap is positive — but within every stratum
    // treated and control means are equal, so the IPW ATE is exactly 0.
    val rows = for {
      dp <- 0 until 4
      u <- 1 to 50
    } yield {
      val ts = Timestamp.valueOf(java.time.LocalDateTime.of(2024, 3, 4, dp * 6 + 1, 0, 0))
      ((dp * 100 + u).toLong, ts, (dp * 100 + u).toLong, "e", 10.0 + 10 * dp)
    }
    asEvents(rows)
    val r = spark.sql(InferenceQueries.ipwSql).collect().head
    assert(r.getAs[Long]("ate_ipw_microcents") === 0L)
    assert(r.getAs[Long]("naive_gap_microcents") > 0L,
      "the confounded naive gap must be biased upward")
    assert(r.getAs[Long]("p_min_permille") < r.getAs[Long]("p_max_permille"),
      "assignment rates must actually vary across strata")
  }

  test("AIPW repairs a misspecified outcome model: ATE exactly 0 where the model gap is biased") {
    // the same confounded null as the IPW spec: outcome depends only on
    // daypart, assignment rate rises with daypart. The GLOBAL outcome
    // model is then biased (naive_model_gap > 0) but the augmentation
    // terms cancel it stratum-by-stratum — exactly, because constant
    // within-stratum outcomes make every truncated division exact.
    val rows = for {
      dp <- 0 until 4
      u <- 1 to 50
    } yield {
      val ts = Timestamp.valueOf(java.time.LocalDateTime.of(2024, 3, 4, dp * 6 + 1, 0, 0))
      ((dp * 100 + u).toLong, ts, (dp * 100 + u).toLong, "e", 10.0 + 10 * dp)
    }
    asEvents(rows)
    val r = spark.sql(InferenceQueries.aipwSql).collect().head
    assert(r.getAs[Long]("naive_model_gap_microcents") > 0L,
      "the global outcome model must be biased under confounding")
    assert(r.getAs[Long]("ate_aipw_microcents") === 0L)
  }

  test("Theil-Sen recovers an exact slope and shrugs off an outlier day") {
    def dayTs(d: Int) = Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 3, 1 + d, 12, 0, 0))
    // exact line: daily revenue 100 + 5d dollars over 9 days
    asEvents((0 until 9).map(d => (d.toLong, dayTs(d), 1L, "e", 100.0 + 5 * d)))
    spark.sql(InferenceQueries.theilSenDaySql).createOrReplaceTempView("theil_days")
    val r1 = spark.sql(InferenceQueries.theilSenRankSql).collect().head
    assert(r1.getAs[Long]("n_pairs") === 36L)
    assert(r1.getAs[Long]("theil_slope_microcents_per_day") === 500L * 1000000L)

    // one wild outlier day: OLS would swing, the median slope must not
    asEvents((0 until 9).map(d =>
      (d.toLong, dayTs(d), 1L, "e", if (d == 4) 9999.0 else 100.0 + 5 * d)))
    spark.sql(InferenceQueries.theilSenDaySql).createOrReplaceTempView("theil_days")
    val r2 = spark.sql(InferenceQueries.theilSenRankSql).collect().head
    assert(r2.getAs[Long]("theil_slope_microcents_per_day") === 500L * 1000000L,
      "a single outlier day must not move the median slope")
  }

  test("Brown-Forsythe: equal spreads score ~0, a wide group scores large") {
    // two groups with IDENTICAL deviation patterns around different
    // medians: |y - med| distributions match, so BF = 0 exactly
    asEvents(Seq(1.0, 2.0, 3.0).zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong, t0, 1L, "a", v), (100L + i, t0, 1L, "b", v + 50)) } )
    val r0 = spark.sql(InferenceQueries.brownForsytheSql).collect().head
    assert(r0.getAs[Long]("n_groups") === 2L)
    assert(r0.getAs[Double]("bf_stat") === 0.0)

    // a tight group vs a wide one: the deviations separate and BF grows
    // with n (here 30+30 points, |z| ~ 0 vs ~ 100 dollars)
    // wide group symmetric around its median (40 / 100 / 160), so its
    // deviations are nearly CONSTANT at $60 — within-variance of |z|
    // stays tiny while the between-group gap is huge
    asEvents(
      (1 to 31).map(i => (i.toLong, t0, 1L, "tight", 100.0)) ++
        (1 to 15).map(i => (100L + i, t0, 1L, "wide", 40.0)) ++
        Seq((200L, t0, 1L, "wide", 100.0)) ++
        (1 to 15).map(i => (300L + i, t0, 1L, "wide", 160.0)))
    val r1 = spark.sql(InferenceQueries.brownForsytheSql).collect().head
    assert(r1.getAs[Double]("bf_stat") > 100.0, s"got ${r1.getAs[Double]("bf_stat")}")
  }

  test("ANOVA F is zero for identical group means, huge for disjoint ones") {
    // 3 groups, each {1, 2, 3} dollars — identical means, SSB = 0, F = 0.
    asEvents(for {
      (g, gi) <- Seq("a", "b", "c").zipWithIndex
      (v, vi) <- Seq(1.0, 2.0, 3.0).zipWithIndex
    } yield ((gi * 3 + vi).toLong, t0, 1L, g, v))
    val r0 = spark.sql(InferenceQueries.anovaSql).collect().head
    assert(r0.getAs[Long]("n_groups") === 3L)
    assert(r0.getAs[Long]("ssb_milli") === 0L)
    assert(r0.getAs[Double]("f_stat") === 0.0)

    // two constant groups far apart: within-variance 0 would blow up F;
    // add one epsilon point so SSW > 0 and F is enormous.
    asEvents(Seq(
      (1L, t0, 1L, "lo", 1.0), (2L, t0, 1L, "lo", 1.0), (3L, t0, 1L, "lo", 1.01),
      (4L, t0, 1L, "hi", 100.0), (5L, t0, 1L, "hi", 100.0), (6L, t0, 1L, "hi", 100.0)))
    val r1 = spark.sql(InferenceQueries.anovaSql).collect().head
    assert(r1.getAs[Long]("ssb_milli") > 0L)
    assert(r1.getAs[Double]("f_stat") > 1000.0)
  }

  test("permutation test: identical constant groups give p = 1000 permille") {
    // purchase and click all $2.00 — observed gap 0, every replica gap 0,
    // so every replica reaches the observed statistic.
    asEvents((1 to 30).map(i =>
      (i.toLong, t0, i.toLong, if (i % 2 == 0) "purchase" else "click", 2.0)))
    val row = spark.sql(InferenceQueries.permutationTestSql).collect().head
    assert(row.getAs[Long]("n_purchase") === 15L)
    assert(row.getAs[Long]("n_click") === 15L)
    assert(row.getAs[Long]("d_obs_microcents") === 0L)
    assert(row.getAs[Long]("p_permille") === 1000L)
  }

  test("permutation test: a huge separation is never reproduced by the null") {
    // purchases $100, clicks $1 — the hash-null reassignments mix the two
    // populations, so no replica reaches the observed 99-dollar gap.
    asEvents((1 to 40).map(i =>
      (i.toLong, t0, i.toLong, if (i % 2 == 0) "purchase" else "click",
        if (i % 2 == 0) 100.0 else 1.0)))
    val row = spark.sql(InferenceQueries.permutationTestSql).collect().head
    assert(row.getAs[Long]("d_obs_microcents") === 99L * 100 * 1000000)
    assert(row.getAs[Long]("p_permille") === 0L)
  }

  test("two-feature OLS recovers exact coefficients from an exact-fit plane") {
    // y = 100 + 7·(hour−12) + 2·(dow−3) dollars on a grid of hours × days:
    // an exact fit, so the centered normal equations return exactly
    // 700/200 cents per unit.
    val rows = for {
      day <- 0 until 7
      hour <- Seq(6, 10, 14, 18)
    } yield {
      val ts = Timestamp.valueOf(java.time.LocalDateTime.of(2024, 3, 4 + day, hour, 0, 0))
      val dowSpark = ((day + 1) % 7) + 1 // 2024-03-04 is a Monday → dayofweek=2
      val x1 = hour - 12
      val x2 = (dowSpark - 1) - 3
      ((day * 24 + hour).toLong, ts, 1L, "e", 100.0 + 7 * x1 + 2 * x2)
    }
    asEvents(rows)
    val r = spark.sql(InferenceQueries.olsMultiSql).collect().head
    assert(r.getAs[Long]("n_rows") === rows.size.toLong)
    assert(math.abs(r.getAs[Double]("beta_hour_cents") - 700.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("beta_dow_cents") - 200.0) < 1e-6)
  }

  test("calibration: a perfectly calibrated split lands on the diagonal") {
    // first half: user u has u purchases out of 10 events → score 100·u
    // permille; second half: user u converts iff u >= 5. Bins are exact.
    val firstTs = new Timestamp(1700000000000L)
    val secondTs = new Timestamp(1700000800000L) // mid = +400s
    val first = for {
      u <- 1 to 9
      i <- 0 until 10
    } yield ((u * 100 + i).toLong, firstTs, u.toLong,
      if (i < u) "purchase" else "view", 1.0)
    val second = (1 to 9).map(u =>
      (9000L + u, secondTs, u.toLong, if (u >= 5) "purchase" else "view", 1.0))
    asEvents(first ++ second)
    val bins = spark.sql(InferenceQueries.calibrationSql).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("mean_score_permille"),
          r.getAs[Long]("observed_permille"))).toMap
    // user u: score u·100 permille → bin u; observed = 1000·[u >= 5]
    (1 to 9).foreach { u =>
      val (n, score, obs) = bins(u.toLong)
      assert(n === 1L)
      assert(score === u * 100L)
      assert(obs === (if (u >= 5) 1000L else 0L))
    }
  }

  test("explained share is ~1 for rank-1 data, ~1/2 for two equal axes") {
    val d = 64
    def axis(k: Int, s: Float) = Array.tabulate(d)(i => if (i == k) s else 0.0f)
    // all variance on one axis: the top component explains everything
    asEmbeddings(Seq((1L, axis(0, 1.0f)), (2L, axis(0, 0.5f)), (3L, axis(0, 0.25f))))
    val r1 = InferenceQueries.overGram(spark, InferenceQueries.pcaExplainedSql).collect().head
    assert(math.abs(r1.getAs[Double]("explained_share") - 1.0) < 0.01)

    // two orthogonal axes with EQUAL mass: the top component carries half
    asEmbeddings(Seq((1L, axis(0, 1.0f)), (2L, axis(7, 1.0f))))
    val r2 = InferenceQueries.overGram(spark, InferenceQueries.pcaExplainedSql).collect().head
    assert(math.abs(r2.getAs[Double]("explained_share") - 0.5) < 0.01)
  }

  test("Spearman is exactly 1 on increasing and -1 on decreasing data") {
    // y strictly increasing in x (user u: u events, total u dollars)
    asEvents((1 to 8).flatMap(u =>
      (1 to u).map(i => ((u * 100 + i).toLong, t0, u.toLong, "e", 1.0))))
    spark.sql(InferenceQueries.spearmanUserSql).createOrReplaceTempView("spearman_u")
    val up = spark.sql(InferenceQueries.spearmanRankSql).collect().head
    assert(up.getAs[Long]("n_users") === 8L)
    assert(math.abs(up.getAs[Double]("rho") - 1.0) < 1e-12)

    // y strictly DECREASING in x: user u has u events each worth 100/u… use
    // totals 9-u dollars so revenue ranks reverse the activity ranks
    asEvents((1 to 8).flatMap { u =>
      val per = (9 - u).toDouble / u
      (1 to u).map(i => ((u * 100 + i).toLong, t0, u.toLong, "e", per))
    })
    spark.sql(InferenceQueries.spearmanUserSql).createOrReplaceTempView("spearman_u")
    val down = spark.sql(InferenceQueries.spearmanRankSql).collect().head
    assert(math.abs(down.getAs[Double]("rho") + 1.0) < 1e-9)
  }

  test("power iteration separates a dominant from a minor axis") {
    // 3 vectors on axis 0, 1 on axis 7 — axis 0 dominates; after three
    // max-norm iterations the axis-7 component must be far below axis 0.
    val d = 64
    def axis(k: Int, s: Float) = Array.tabulate(d)(i => if (i == k) s else 0.0f)
    asEmbeddings(Seq((1L, axis(0, 1.0f)), (2L, axis(0, 0.9f)),
      (3L, axis(0, 0.8f)), (4L, axis(7, 0.6f))))
    val v = InferenceQueries.overGram(spark, InferenceQueries.pcaPowerSql).collect()
      .map(r => r.getAs[Long]("i") -> r.getAs[Long]("v_micro")).toMap
    assert(math.abs(v(0L)) > 999000L)
    // Gram is diagonal here, so the ratio contracts by (λ2/λ1) each round
    assert(math.abs(v(7L)) < v(0L) / 100L, s"v(7) = ${v(7L)} not contracted")
  }

  // ------------------------------------------------ logistic IRLS (r14)

  /** Run the two lrIterSql iterations over a hand-built (x1, x2, y)
    * frame, exactly as the x_logreg_irls query does.
    */
  private def irlsBetas(rows: Seq[(Long, Long, Long)]): Map[Long, (Long, Long, Long)] = {
    rows.toDF("x1", "x2", "y").createOrReplaceTempView("lr_spec_base")
    spark.sql(InferenceQueries.lrIterSql(" DIV", "lr_spec_base", InferenceQueries.lrZeroBetas))
      .localCheckpoint().createOrReplaceTempView("lr_b1")
    spark.sql(InferenceQueries.lrIterSql(" DIV", "lr_spec_base", "lr_b1"))
      .localCheckpoint().createOrReplaceTempView("lr_b2")
    spark.sql(InferenceQueries.lrFinalSql).collect()
      .map(r => r.getAs[Long]("iter") ->
        ((r.getAs[Long]("b0_micro"), r.getAs[Long]("b1_micro"), r.getAs[Long]("b2_micro"))))
      .toMap
  }

  /** Unquantized double-precision IRLS twin (2 iterations from 0). */
  private def irlsRef(rows: Seq[(Long, Long, Long)]): Array[Double] = {
    var beta = Array(0.0, 0.0, 0.0)
    (1 to 2).foreach { _ =>
      var a = Array.ofDim[Double](3, 3); var r = new Array[Double](3)
      rows.foreach { case (x1, x2, y) =>
        val xs = Array(1.0, x1.toDouble, x2.toDouble)
        val eta = xs.zip(beta).map { case (x, b) => x * b }.sum
        val p = 1.0 / (1.0 + math.exp(-eta))
        val w = p * (1 - p)
        val wz = w * eta + (y - p)
        for (i <- 0 to 2; j <- 0 to 2) a(i)(j) += w * xs(i) * xs(j)
        for (i <- 0 to 2) r(i) += wz * xs(i)
      }
      // Cramer, same as the SQL
      val (aa, b, c, d, e, f) = (a(0)(0), a(0)(1), a(0)(2), a(1)(1), a(1)(2), a(2)(2))
      val det = aa * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d)
      beta = Array(
        (r(0) * (d * f - e * e) - b * (r(1) * f - e * r(2)) + c * (r(1) * e - d * r(2))) / det,
        (aa * (r(1) * f - e * r(2)) - r(0) * (b * f - e * c) + c * (b * r(2) - r(1) * c)) / det,
        (aa * (d * r(2) - r(1) * e) - b * (b * r(2) - r(1) * c) + r(0) * (b * e - d * c)) / det)
    }
    beta
  }

  private def gbdtStumps(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long, Long, Long)] = {
    rows.toDF("x1", "x2", "y").createOrReplaceTempView("gb_spec_base")
    InferenceQueries.gbdtOver(spark, "gb_spec_base").collect().toSeq
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("feature").toString.toLong,
        r.getAs[Long]("threshold"), r.getAs[Long]("n_left"),
        r.getAs[Long]("w_left_micro"), r.getAs[Long]("w_right_micro")))
      .sortBy(_._1)
  }

  /** Exact-integer single-threaded twin of the distributed boosting. */
  private def gbdtRef(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long, Long, Long)] = {
    def idiv(a: Long, b: Long): Long = a / b // JVM / truncates toward zero, same as DIV
    var f = rows.map(_ => 0L)
    (1 to 3).map { t =>
      val residual = rows.zip(f).map { case ((_, _, y), fi) => y * 1000000L - fi }
      val best = (1 to 2).flatMap { feat =>
        val vOf = (r: (Long, Long, Long)) => if (feat == 1) r._1 else r._2
        val hist = rows.zip(residual).groupBy { case (r, _) => vOf(r) }
          .map { case (v, g) => (v, g.size.toLong, g.map(_._2).sum) }.toSeq.sortBy(_._1)
        val (n, s) = (hist.map(_._2).sum, hist.map(_._3).sum)
        hist.scanLeft((0L, 0L, 0L)) { case ((_, cn, cs), (v, c, sr)) => (v, cn + c, cs + sr) }
          .drop(1).filter(_._2 < n).map { case (v, nL, sL) =>
            val gain = sL.toDouble * sL / nL + (s - sL).toDouble * (s - sL) / (n - nL)
            (-gain, feat.toLong, v, nL, idiv(sL, nL), idiv(s - sL, n - nL))
          }
      }.min
      val (_, feat, thr, nL, wl, wr) = best
      f = rows.zip(f).map { case (r, fi) =>
        fi + (if ((if (feat == 1) r._1 else r._2) <= thr) wl else wr) }
      (t.toLong, feat, thr, nL, wl, wr)
    }
  }

  test("gbdt stumps: a separable single feature is fit exactly in round 1, then zero residuals") {
    // y = [x1 >= 5]; x2 is pure noise-free constant. Round 1 must split
    // feature 1 at threshold 4 with exact leaf means 0 / 1e6; rounds 2-3
    // see all-zero residuals and fit zero-valued leaves.
    val rows = (0L to 9L).flatMap(v => Seq.fill(3)((v, 0L, if (v >= 5) 1L else 0L)))
    val got = gbdtStumps(rows)
    assert(got.head === ((1L, 1L, 4L, 15L, 0L, 1000000L)), s"round 1: ${got.head}")
    assert(got.tail.forall(s => s._5 == 0L && s._6 == 0L),
      s"later rounds must fit zero leaves: $got")
  }

  test("gbdt stumps: distributed fit equals the exact-integer reference on a noisy frame") {
    val rows = (0 until 300).map { i =>
      val x1 = (i % 11).toLong
      val x2 = (i % 6).toLong
      val noisy = (h64(s"gb$i") % 10) < 2 // 20% label noise
      val signal = x1 >= 6 || x2 == 3
      (x1, x2, if (signal ^ noisy) 1L else 0L)
    }
    assert(gbdtStumps(rows) === gbdtRef(rows))
  }

  test("logistic IRLS: y independent of features in balanced cells fits betas exactly 0") {
    // every (x1, x2) cell holds one y=1 and one y=0 row: p̂ = 0.5
    // everywhere, the working response sums to zero per cell, and both
    // iterations must return EXACTLY (0, 0, 0) — the integer path never
    // manufactures a spurious coefficient.
    val rows = for {
      x1 <- 0L to 3L; x2 <- 0L to 2L; y <- Seq(0L, 1L)
    } yield (x1, x2, y)
    val got = irlsBetas(rows)
    assert(got(1L) === ((0L, 0L, 0L)), s"iter 1: ${got(1L)}")
    assert(got(2L) === ((0L, 0L, 0L)), s"iter 2: ${got(2L)}")
  }

  test("logistic IRLS: a singular design (constant feature) degrades to zero betas, not NaN") {
    // x1 is constant — collinear with the intercept, so the 3×3 normal
    // equations are singular and the Cramer determinant is exactly 0.
    // The guard must return (0, 0, 0) in BOTH engines rather than NaN/Inf
    // (Spark non-ANSI casts NaN to 0/NULL where DuckDB errors — an
    // engine-vs-oracle divergence if left unguarded).
    // 12 rows keeps every moment product under 2^53, so the determinant
    // cancellation is EXACT in doubles (larger frames can leave a tiny
    // rounding residue — still engine-identical, but not exactly 0)
    val rows = (0 until 12).map(i => (7L, (i % 3).toLong, (i % 2).toLong))
    val got = irlsBetas(rows)
    assert(got(1L) === ((0L, 0L, 0L)), s"iter 1: ${got(1L)}")
    assert(got(2L) === ((0L, 0L, 0L)), s"iter 2: ${got(2L)}")
  }

  test("logistic IRLS: quantized distributed fit matches the double-precision twin to 1e-3") {
    // y depends on x1 positively and x2 negatively, with hash-shaped
    // noise — a real (non-degenerate, non-separable) fit
    val rows = (0 until 400).map { i =>
      val x1 = (i % 7).toLong
      val x2 = (i % 5).toLong
      val noise = (h64(s"lr$i") % 100).toDouble / 100.0
      val p = 1.0 / (1.0 + math.exp(-(-0.8 + 0.5 * x1 - 0.4 * x2)))
      (x1, x2, if (noise < p) 1L else 0L)
    }
    val got = irlsBetas(rows)
    val want = irlsRef(rows)
    val (b0, b1, b2) = got(2L)
    assert(math.abs(b0 / 1e6 - want(0)) < 1e-3, s"b0 ${b0 / 1e6} vs ${want(0)}")
    assert(math.abs(b1 / 1e6 - want(1)) < 1e-3, s"b1 ${b1 / 1e6} vs ${want(1)}")
    assert(math.abs(b2 / 1e6 - want(2)) < 1e-3, s"b2 ${b2 / 1e6} vs ${want(2)}")
    // and the fit actually learned the planted directions
    assert(b1 > 0 && b2 < 0, s"signs: $b1, $b2")
  }
}
