package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property net for the inference pack's invariants over adversarial
  * populations — the guarantees that must hold for ANY input, not just
  * the closed-form fixtures:
  *
  *  - bootstrap: lo ≤ point ≤ hi (the sentinel replica is the truth and
  *    the CI is made of order statistics around it), for means AND
  *    medians;
  *  - JSD: non-negative for every source, exactly zero when all sources
  *    share one distribution;
  *  - Spearman: within [-1, 1] whenever defined;
  *  - median bootstrap point = the exact lower weighted median.
  *
  * Generators target the quantization edges: tiny populations, heavy
  * ties, negative-adjacent cents (value 0), extreme skew.
  */
class InferencePropSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = new Timestamp(1700000000000L)

  private val popGen: Gen[List[(Long, Double)]] = for {
    n <- Gen.choose(3, 120)
    shape <- Gen.oneOf("uniform", "ties", "skew", "constant")
    vs <- shape match {
      case "uniform"  => Gen.listOfN(n, Gen.choose(0, 24900).map(_ / 100.0))
      case "ties"     => Gen.listOfN(n, Gen.oneOf(Seq(0.0, 0.01, 7.0, 7.0, 249.0)))
      case "skew"     => Gen.listOfN(n, Gen.frequency(
        9 -> Gen.choose(0, 100).map(_ / 100.0), 1 -> Gen.const(249.99)))
      case "constant" => Gen.const(List.fill(n)(42.42))
    }
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong + 1, v) }

  private def loadEvents(pop: List[(Long, Double)]): Unit =
    pop.map { case (u, v) => (u, t0, u, "buy", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .createOrReplaceTempView("events")

  test("property: both bootstrap CIs bracket their sentinel point estimate") {
    val prop = Prop.forAll(popGen) { pop =>
      loadEvents(pop)
      spark.sql(InferenceQueries.bootstrapUserSql).createOrReplaceTempView("bs_u")
      val m = spark.sql(InferenceQueries.bootstrapSql).collect().head
      val md = spark.sql(InferenceQueries.bootstrapMedianSql).collect().head
      val meanOk = m.getAs[Long]("ci_lo_cents") <= m.getAs[Long]("point_mean_cents") &&
        m.getAs[Long]("point_mean_cents") <= m.getAs[Long]("ci_hi_cents")
      // exact lower weighted median of the per-user totals
      val cents = pop.map { case (_, v) => math.floor(v * 100 + 0.5).toLong }.sorted
      val wantMed = cents((cents.size - 1) / 2)
      val medOk = md.getAs[Long]("point_median_cents") == wantMed &&
        md.getAs[Long]("ci_lo_cents") <= wantMed &&
        wantMed <= md.getAs[Long]("ci_hi_cents")
      if (!(meanOk && medOk))
        println(s"MISMATCH n=${pop.size} mean=$m median=$md want_med=$wantMed")
      meanOk && medOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: JSD is non-negative everywhere, zero for identical sources") {
    val docGen: Gen[(Int, List[String])] = for {
      nSrc <- Gen.choose(1, 4)
      nDoc <- Gen.choose(1, 12)
      words <- Gen.listOfN(nDoc,
        Gen.listOfN(6, Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.mkString(" ")))
    } yield (nSrc, words)
    val prop = Prop.forAll(docGen) { case (nSrc, texts) =>
      texts.zipWithIndex.map { case (t, i) => (i.toLong, s"s${i % nSrc}", t) }
        .toDF("doc_id", "source", "text").createOrReplaceTempView("documents")
      spark.sql(InferenceQueries.jsTermCountsSql).createOrReplaceTempView("js_st")
      val rows = spark.sql(InferenceQueries.jsDivergenceRankSql).collect()
        .map(_.getAs[Long]("jsd_micro"))
      // quantization floors each CLOSED-FORM term, so "non-negative" holds
      // up to one micro of floor slack per component
      val nonNeg = rows.forall(_ >= -2L)
      if (!nonNeg) println(s"NEGATIVE JSD: ${rows.toSeq}")
      nonNeg
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)

    // one source duplicated verbatim across sources: exactly zero for all
    (1 to 3).map(i => (i.toLong, s"s$i", "xx yy zz xx"))
      .toDF("doc_id", "source", "text").createOrReplaceTempView("documents")
    spark.sql(InferenceQueries.jsTermCountsSql).createOrReplaceTempView("js_st")
    spark.sql(InferenceQueries.jsDivergenceRankSql).collect()
      .foreach(r => assert(r.getAs[Long]("jsd_micro") === 0L))
  }

  test("property: Spearman stays within [-1, 1] on arbitrary populations") {
    val prop = Prop.forAll(popGen) { pop =>
      // events per user = 1 + (u % 3) so activity varies; revenue from pop
      pop.flatMap { case (u, v) =>
        (0 until (1 + (u % 3)).toInt).map(k =>
          (u * 10 + k, t0, u, "buy", v / (1 + (u % 3))))
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
        .createOrReplaceTempView("events")
      spark.sql(InferenceQueries.spearmanUserSql).createOrReplaceTempView("spearman_u")
      val rho = spark.sql(InferenceQueries.spearmanRankSql).collect()
        .head.getAs[Double]("rho")
      val ok = rho.isNaN || (rho >= -1.0000001 && rho <= 1.0000001)
      if (!ok) println(s"RHO OUT OF RANGE: $rho n=${pop.size}")
      ok
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
