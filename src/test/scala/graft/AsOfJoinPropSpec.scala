package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.AsOfJoin

/** Property net for the union+window as-of join: over random keyed
  * time series with heavy tie collisions (small time domain), backward
  * and forward as-of must equal the naive per-left-row argmax/argmin —
  * including the tie rules (backward: latest right at equal times by
  * max seq; forward: first right by min seq) and null results before
  * the first / after the last right row.
  */
class AsOfJoinPropSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[(Seq[(Long, Long, Long)], Seq[(Long, Long, Long, Long)])] =
    for {
      lefts <- Gen.listOfN(15, for {
        k <- Gen.choose(0L, 2L); t <- Gen.choose(0L, 12L)
      } yield (k, t))
      rights <- Gen.listOfN(15, for {
        k <- Gen.choose(0L, 2L); t <- Gen.choose(0L, 12L)
      } yield (k, t))
    } yield (
      lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      rights.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t, i.toLong) })

  test("property: backward and forward as-of equal the naive argmax with tie rules") {
    val prop = Prop.forAll(rowsGen) { case (ls, rs) =>
      val left = ls.toDF("l_id", "k", "t")
      val right = rs.toDF("r_id", "k", "rt", "seq")

      val gotB = AsOfJoin.asofJoin(left, right, "k", "t", "rt", Seq("r_id"), "seq")
        .select("l_id", "r_id").as[(Long, Option[Long])].collect().toMap
      val gotF = AsOfJoin.asofJoinForward(left, right, "k", "t", "rt", Seq("r_id"), "seq")
        .select("l_id", "r_id").as[(Long, Option[Long])].collect().toMap

      val wantB = ls.map { case (lid, k, t) =>
        val c = rs.filter(r => r._2 == k && r._3 <= t)
        lid -> (if (c.isEmpty) None
                else Some(c.maxBy(r => (r._3, r._4))._1)) // latest time, then max seq
      }.toMap
      val wantF = ls.map { case (lid, k, t) =>
        val c = rs.filter(r => r._2 == k && r._3 >= t)
        lid -> (if (c.isEmpty) None
                else Some(c.minBy(r => (r._3, r._4))._1)) // earliest time, then min seq
      }.toMap
      if (gotB != wantB || gotF != wantF)
        println(s"MISMATCH ls=$ls rs=$rs\n gotB=$gotB wantB=$wantB\n gotF=$gotF wantF=$wantF")
      gotB == wantB && gotF == wantF
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
