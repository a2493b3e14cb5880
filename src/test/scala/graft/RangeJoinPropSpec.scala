package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.RangeJoin

/** Property net for the bucketized range joins: over random interval and
  * point sets (random keys, random epochs straddling bucket boundaries
  * and zero, degenerate and inverted intervals included), the bucketized
  * plans must equal the naive band/overlap joins PAIR-FOR-PAIR, with
  * each pair emitted exactly once. A single-claim bug (pair counted per
  * shared bucket), a boundary-inclusivity slip, or a floor-vs-truncation
  * bucketing error shows up here as a set or multiplicity mismatch.
  */
class RangeJoinPropSpec extends SparkSpec {
  import spark.implicits._

  private val Bucket = 60L * 1000000 // 1-minute buckets

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // epochs clustered around bucket edges, zero, and negatives
  private val secGen: Gen[Long] = Gen.frequency(
    3 -> Gen.choose(-300L, 600L),
    2 -> Gen.oneOf(Seq(-60L, -1L, 0L, 1L, 59L, 60L, 61L, 119L, 120L, 121L)),
    1 -> Gen.choose(0L, 3000L))

  private val intervalsGen: Gen[Seq[(Long, Long, Long, Long)]] =
    Gen.listOfN(12, for {
      k <- Gen.choose(0L, 2L)
      s <- secGen
      len <- Gen.oneOf(Seq(-30L, 0L, 1L, 59L, 60L, 61L, 180L)) // incl. inverted + zero-length
    } yield (k, s, s + len)).map(_.zipWithIndex.map { case ((k, s, e), i) =>
      (i.toLong, k, s, e)
    })

  private val pointsGen: Gen[Seq[(Long, Long, Long)]] =
    Gen.listOfN(20, for {
      k <- Gen.choose(0L, 2L)
      t <- secGen
    } yield (k, t)).map(_.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t) })

  private def ivDf(rows: Seq[(Long, Long, Long, Long)]): DataFrame =
    rows.map { case (id, k, s, e) => (id, k, ts(s), ts(e)) }.toDF("iv_id", "k", "s", "e")
  private def ptDf(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.map { case (id, k, t) => (id, k, ts(t)) }.toDF("pt_id", "k", "t")

  test("property: intervalJoin == naive band join, exactly once per pair") {
    val prop = Prop.forAll(intervalsGen, pointsGen) { (ivs, pts) =>
      val iv = ivDf(ivs); val pt = ptDf(pts)
      val got = RangeJoin.intervalJoin(iv, pt, Seq("k"), "s", "e", "t", Bucket,
          includeStart = true, includeEnd = false, maxBuckets = 256)
        .select("iv_id", "pt_id").as[(Long, Long)].collect().toSeq
      val want = iv.join(pt, Seq("k"))
        .filter(col("t") >= col("s") && col("t") < col("e"))
        .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
      val once = got.size == got.toSet.size
      if (!(once && got.toSet == want))
        println(s"MISMATCH ivs=$ivs pts=$pts got=$got want=$want")
      once && got.toSet == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: intervalOverlapJoin == naive overlap join, exactly once per pair") {
    val prop = Prop.forAll(intervalsGen, intervalsGen) { (as, bs) =>
      val a = ivDf(as).toDF("a_id", "k", "a_s", "a_e")
      val b = ivDf(bs).toDF("b_id", "k", "b_s", "b_e")
      val got = RangeJoin.intervalOverlapJoin(a, b, Seq("k"),
          "a_s", "a_e", "b_s", "b_e", Bucket, maxBuckets = 256)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      val want = a.join(b, Seq("k"))
        // inverted intervals are defined to match nothing (the operator
        // drops them); zero-length ones follow the strict formula on
        // both sides, so no guard is needed for s == e
        .filter(col("a_s") <= col("a_e") && col("b_s") <= col("b_e") &&
          col("a_s") < col("b_e") && col("b_s") < col("a_e"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val once = got.size == got.toSet.size
      if (!(once && got.toSet == want))
        println(s"MISMATCH as=$as bs=$bs got=$got want=$want")
      once && got.toSet == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
