package graft

import org.apache.spark.sql.functions._

/** BandJoinViaBuckets: a natural literal-width band join rewrites to the
  * bucketized equi-join (bucket equality visible in the optimized plan),
  * the result is unchanged, and out-of-scope shapes pass through.
  */
class BandJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("band join rewrites to a bucketized equi-join with identical results") {
    val anchors = Seq((1L, 1L, ts(100)), (2L, 1L, ts(5000)), (3L, 2L, ts(100)))
      .toDF("a_id", "k", "a_ts")
    val probes = Seq((11L, 1L, ts(150)), (12L, 1L, ts(100)), (13L, 1L, ts(3700)),
      (14L, 1L, ts(5100)), (15L, 2L, ts(99)), (16L, 2L, ts(101)), (17L, 3L, ts(110)))
      .toDF("p_id", "k", "p_ts")
    anchors.createOrReplaceTempView("band_anchors")
    probes.createOrReplaceTempView("band_probes")

    val q =
      """SELECT a.a_id, p.p_id FROM band_anchors a JOIN band_probes p
        |  ON a.k = p.k AND p.p_ts > a.a_ts AND p.p_ts <= a.a_ts + INTERVAL 1 HOUR""".stripMargin
    val df = spark.sql(q)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("__band_bucket"),
      s"band join did not bucketize:\n$optimized")
    assert(optimized.contains("explode(sequence"),
      s"anchor side did not explode its bucket range:\n$optimized")

    val got = df.as[(Long, Long)].collect().toSet
    // manual band semantics on the same rows
    val want = Set((1L, 11L), (1L, 13L), (2L, 14L), (3L, 16L))
    assert(got == want, s"rewrite changed the result: $got")

    // each qualifying pair exactly once even when the window spans a
    // bucket boundary (anchor at 100s, 1h window crosses the 3600s line)
    val boundary = spark.sql(
      """SELECT a.a_id, p.p_id FROM band_anchors a JOIN band_probes p
        |  ON a.k = p.k AND p.p_ts >= a.a_ts AND p.p_ts <= a.a_ts + INTERVAL 1 HOUR""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(boundary.size == boundary.toSet.size, s"duplicated pairs: $boundary")
    assert(boundary.toSet == Set((1L, 11L), (1L, 12L), (1L, 13L), (2L, 14L), (3L, 16L)))
  }

  test("out-of-scope shapes pass through untouched") {
    val a = Seq((1L, 1L, ts(0), ts(100))).toDF("a_id", "k", "s", "e")
    val p = Seq((2L, 1L, ts(50))).toDF("p_id", "k", "t")
    a.createOrReplaceTempView("oos_a"); p.createOrReplaceTempView("oos_p")
    // column upper bound (no literal width): not rewritten
    val colBound = spark.sql(
      """SELECT a_id, p_id FROM oos_a a JOIN oos_p p
        |  ON a.k = p.k AND p.t >= a.s AND p.t < a.e""".stripMargin)
    assert(!colBound.queryExecution.optimizedPlan.toString.contains("__band_bucket"))
    assert(colBound.as[(Long, Long)].collect().toSeq == Seq((1L, 2L)))
    // no equi key: not rewritten (and still correct)
    val noKey = spark.sql(
      """SELECT a_id, p_id FROM oos_a a JOIN oos_p p
        |  ON p.t >= a.s AND p.t <= a.s + INTERVAL 2 MINUTES""".stripMargin)
    assert(!noKey.queryExecution.optimizedPlan.toString.contains("__band_bucket"))
    assert(noKey.as[(Long, Long)].collect().toSeq == Seq((1L, 2L)))
  }
}
