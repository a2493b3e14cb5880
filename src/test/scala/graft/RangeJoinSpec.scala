package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RangeJoin: the bucketized interval x point join must equal the naive
  * band join on every bucket-boundary shape, honor the four inclusivity
  * combinations, drop degenerate/null intervals, and fail loudly on an
  * interval that would explode past the bucket guard.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // timestamps in seconds for readable cases; bucket = 100s
  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def intervals(rows: (Long, Long, Long, Long)*): DataFrame =
    rows.toSeq.map { case (id, k, s, e) => (id, k, ts(s), ts(e)) }
      .toDF("iv_id", "k", "s", "e")

  private def points(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.map { case (id, k, t) => (id, k, ts(t)) }
      .toDF("pt_id", "k", "t")

  private def pairs(iv: DataFrame, pt: DataFrame,
                    inclStart: Boolean = true, inclEnd: Boolean = false,
                    bucket: Long = 100L * 1000000): Set[(Long, Long)] =
    RangeJoin.intervalJoin(iv, pt, Seq("k"), "s", "e", "t", bucket,
        includeStart = inclStart, includeEnd = inclEnd)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet

  test("equals the naive band join across bucket boundaries") {
    // intervals straddling 0/1/2 bucket boundaries of width 100s
    val iv = intervals((1L, 1L, 10L, 90L), (2L, 1L, 50L, 150L),
      (3L, 1L, 95L, 305L), (4L, 2L, 10L, 90L))
    val pt = points((101L, 1L, 10L), (102L, 1L, 90L), (103L, 1L, 100L),
      (104L, 1L, 149L), (105L, 1L, 300L), (106L, 2L, 50L), (107L, 3L, 50L))
    val naive = iv.join(pt, Seq("k"))
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(pairs(iv, pt) == naive)
    assert(naive == Set((1L, 101L), (2L, 102L), (2L, 103L),
      (2L, 104L), (3L, 103L), (3L, 104L), (3L, 105L), (4L, 106L)))
  }

  test("inclusivity combinations at exact boundaries") {
    val iv = intervals((1L, 1L, 100L, 200L))
    val pt = points((1L, 1L, 100L), (2L, 1L, 150L), (3L, 1L, 200L))
    assert(pairs(iv, pt, inclStart = true, inclEnd = false) == Set((1L, 1L), (1L, 2L)))
    assert(pairs(iv, pt, inclStart = false, inclEnd = true) == Set((1L, 2L), (1L, 3L)))
    assert(pairs(iv, pt, inclStart = true, inclEnd = true) ==
      Set((1L, 1L), (1L, 2L), (1L, 3L)))
    assert(pairs(iv, pt, inclStart = false, inclEnd = false) == Set((1L, 2L)))
  }

  test("degenerate, inverted, and null-key rows match nothing (and don't crash)") {
    val iv = Seq(
      (1L, java.lang.Long.valueOf(1L), ts(200L), ts(100L)), // inverted
      (2L, java.lang.Long.valueOf(1L), null, ts(100L)),     // null start
      (3L, null.asInstanceOf[java.lang.Long], ts(0L), ts(100L)), // null key
      (4L, java.lang.Long.valueOf(1L), ts(50L), ts(50L))    // zero-length
    ).toDF("iv_id", "k", "s", "e")
    val pt = Seq(
      (1L, java.lang.Long.valueOf(1L), ts(50L)),
      (2L, null.asInstanceOf[java.lang.Long], ts(50L))
    ).toDF("pt_id", "k", "t")
    // zero-length [50,50] matches t=50 only when both ends inclusive
    assert(pairs(iv, pt) == Set.empty)
    assert(pairs(iv, pt, inclStart = true, inclEnd = true) == Set((4L, 1L)))
  }

  test("negative-epoch timestamps bucket correctly (floor, not truncation)") {
    // -50s sits in bucket -1 of width 100s; truncation toward zero would
    // put it in bucket 0 beside +50s and lose the cross-zero pair
    val iv = intervals((1L, 1L, -150L, 60L))
    val pt = points((1L, 1L, -50L), (2L, 1L, 50L), (3L, 1L, -160L))
    assert(pairs(iv, pt) == Set((1L, 1L), (1L, 2L)))
  }

  test("an interval spanning more than maxBuckets fails loudly") {
    val iv = intervals((1L, 1L, 0L, 1000L))
    val pt = points((1L, 1L, 5L))
    val e = intercept[Exception] {
      RangeJoin.intervalJoin(iv, pt, Seq("k"), "s", "e", "t",
        bucketMicros = 100L * 1000000, maxBuckets = 5).count()
    }
    assert(e.getMessage != null)
    val out = RangeJoin.intervalJoin(iv, pt, Seq("k"), "s", "e", "t",
      bucketMicros = 100L * 1000000, maxBuckets = 16)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L)))
  }

  test("interval overlap join equals the naive overlap join, exactly once per pair") {
    // pairs sharing SEVERAL buckets (long overlaps) must still appear once
    val a = Seq((1L, 1L, ts(0L), ts(500L)), (2L, 1L, ts(450L), ts(700L)),
      (3L, 1L, ts(900L), ts(950L)), (4L, 2L, ts(0L), ts(100L)))
      .toDF("a_id", "k", "a_s", "a_e")
    val b = Seq((11L, 1L, ts(100L), ts(600L)), (12L, 1L, ts(500L), ts(901L)),
      (13L, 1L, ts(950L), ts(1000L)), (14L, 2L, ts(100L), ts(200L)))
      .toDF("b_id", "k", "b_s", "b_e")
    val got = RangeJoin.intervalOverlapJoin(a, b, Seq("k"),
        "a_s", "a_e", "b_s", "b_e", bucketMicros = 100L * 1000000)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    val naive = a.join(b, Seq("k"))
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got.size == got.toSet.size, s"pair emitted more than once: $got")
    assert(got.toSet == naive)
    // half-open: [0,500) x [500,901) touch but do not overlap; (3,12)
    // overlaps by 1s across a bucket boundary; (4,14) touching-at-100
    // excluded
    assert(naive == Set((1L, 11L), (2L, 11L), (2L, 12L), (3L, 12L)))
  }

  test("overlapping non-key column names are rejected") {
    val iv = intervals((1L, 1L, 0L, 10L)).withColumnRenamed("iv_id", "id")
    val pt = points((1L, 1L, 5L)).withColumnRenamed("pt_id", "id")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(iv, pt, Seq("k"), "s", "e", "t", 1000000L)
    }
    assert(e.getMessage.contains("id"))
  }
}
