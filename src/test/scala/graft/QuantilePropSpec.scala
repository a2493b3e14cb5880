package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property net for the histogram-refine exact-quantile rewrite
  * (`OlapQueries.histogramRefineSql` — the SAME SQL the oracle queries
  * run): over adversarial value distributions it must equal the naive
  * sorted order statistic k = ((n-1)·p) DIV 100 + 1 for every
  * percentile. The generator targets the rewrite's failure surfaces:
  * heavy ties (many values share one bucket), extreme skew (hi − lo
  * forces bucket width > 1), negatives (the (cents − lo) shift), tiny n
  * (candidate bucket = whole table), constant columns (wd = 1, single
  * bucket 0), and values straddling bucket boundaries.
  */
class QuantilePropSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(1, 25, 50, 75, 99, 100)

  private val valuesGen: Gen[List[Long]] = Gen.sized { _ =>
    for {
      n <- Gen.choose(1, 400)
      shape <- Gen.oneOf("uniform", "ties", "skew", "constant", "edges")
      vs <- shape match {
        case "uniform"  => Gen.listOfN(n, Gen.choose(-100000L, 100000L))
        case "ties"     => Gen.listOfN(n, Gen.oneOf(Seq(-7L, 0L, 3L, 3L, 1024L)))
        case "skew"     => Gen.listOfN(n, Gen.frequency(
          9 -> Gen.choose(0L, 100L), 1 -> Gen.choose(1000000000L, 2000000000L)))
        case "constant" => Gen.const(List.fill(n)(42L))
        case "edges"    => Gen.listOfN(n, Gen.oneOf(
          Seq(Long.MinValue / 4, -1024L, -1023L, -1L, 0L, 1L, 1023L, 1024L, 1025L, Long.MaxValue / 4)))
      }
    } yield vs
  }

  test("property: histogram-refine == sorted order statistic on adversarial distributions") {
    val prop = Prop.forAll(valuesGen) { vs =>
      vs.toDF("cents").createOrReplaceTempView("qprop")
      val got = spark.sql(OlapQueries.histogramRefineSql("SELECT cents FROM qprop", ps))
        .select("p", "q_cents").as[(Long, Long)].collect().toMap
      val sorted = vs.sorted
      val want = ps.map { p =>
        val k = ((vs.size - 1).toLong * p) / 100 + 1
        p.toLong -> sorted((k - 1).toInt)
      }.toMap
      if (got != want) println(s"MISMATCH n=${vs.size} got=$got want=$want vs=${vs.take(30)}")
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: grouped histogram-refine == per-group sorted order statistic") {
    val groupedGen: Gen[List[(String, Long)]] = for {
      vs <- valuesGen
      gs <- Gen.listOfN(vs.size, Gen.oneOf("a", "b", "c"))
    } yield gs.zip(vs)
    val prop = Prop.forAll(groupedGen) { rows =>
      rows.toDF("g", "cents").createOrReplaceTempView("qpropg")
      val got = spark.sql(OlapQueries.groupedHistogramRefineSql("SELECT g, cents FROM qpropg", ps))
        .select("g", "p", "q_cents").as[(String, Long, Long)].collect()
        .map { case (g, p, v) => (g, p) -> v }.toMap
      val want = rows.groupBy(_._1).flatMap { case (g, grs) =>
        val sorted = grs.map(_._2).sorted
        ps.map { p =>
          val k = ((grs.size - 1).toLong * p) / 100 + 1
          (g, p.toLong) -> sorted((k - 1).toInt)
        }
      }.toMap
      if (got != want) println(s"MISMATCH got=$got want=$want rows=${rows.take(30)}")
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("p=100 returns the max and p=1 the first order statistic on a known set") {
    Seq(5L, -3L, 9L, 9L, 0L).toDF("cents").createOrReplaceTempView("qprop")
    val got = spark.sql(OlapQueries.histogramRefineSql("SELECT cents FROM qprop", Seq(1, 100)))
      .select("p", "q_cents").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> -3L, 100L -> 9L))
  }
}
