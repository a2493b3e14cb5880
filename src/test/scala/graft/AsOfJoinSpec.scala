package graft

import graft.ops.{AsOfJoin, Salting}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof: inclusive tie, latest-right carry, null before first right row") {
    val left = Seq((1L, 5L, "l1"), (1L, 10L, "l2"), (1L, 20L, "l3"), (2L, 1L, "l4"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "a", 1L), (1L, 5L, "b", 2L), (1L, 15L, "c", 3L))
      .toDF("k", "rt", "rv", "seq")
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "rt", Seq("rv"), "seq")
      .orderBy("k", "t")
      .select("k", "t", "lv", "rv").as[(Long, Long, String, String)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, "l1", "b"),   // inclusive <=; tie among rt=5 -> max seq
      (1L, 10L, "l2", "b"),
      (1L, 20L, "l3", "c"),  // latest right row carried
      (2L, 1L, "l4", null))) // no prior right row
  }

  test("asof: right columns never mix across right rows (struct carry)") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "lv")
    // latest right row has a NULL in rv2 — the null must be attached,
    // not back-filled from the older row
    val right = Seq((1L, 1L, "old", "oldv2", 1L), (1L, 9L, "new", null, 2L))
      .toDF("k", "rt", "rv", "rv2", "seq")
    val r = AsOfJoin.asofJoin(left, right, "k", "t", "rt", Seq("rv", "rv2"), "seq").head()
    assert(r.getAs[String]("rv") == "new" && r.getAs[String]("rv2") == null)
  }

  test("asof forward: inclusive tie takes the FIRST right row, null after the last one") {
    val left = Seq((1L, 5L, "l1"), (1L, 10L, "l2"), (1L, 20L, "l3"), (2L, 1L, "l4"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "a", 1L), (1L, 5L, "b", 2L), (1L, 15L, "c", 3L), (2L, 0L, "d", 4L))
      .toDF("k", "rt", "rv", "seq")
    val out = AsOfJoin.asofJoinForward(left, right, "k", "t", "rt", Seq("rv"), "seq")
      .orderBy("k", "t")
      .select("k", "t", "lv", "rv").as[(Long, Long, String, String)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, "l1", "a"),   // inclusive >=; tie among rt=5 -> min seq
      (1L, 10L, "l2", "c"),  // next right at 15
      (1L, 20L, "l3", null), // nothing after 15
      (2L, 1L, "l4", null))) // right row is strictly before
  }

  test("salted join equals the plain join on skewed data") {
    // 90% of the big side shares one hot key
    val big = spark.range(0, 20000)
      .select((when($"id" % 10 < 9, 7L).otherwise($"id" % 100)).as("k"),
        ($"id" * 3).as("payload"))
    val small = spark.range(0, 100).select($"id".as("k"), ($"id" % 5).as("dim"))
    val plain = big.join(small, "k")
    val salted = Salting.saltedJoin(big, small, "k", factor = 8)
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("payload")).head().getLong(0) ==
      plain.agg(sum("payload")).head().getLong(0))
  }

  test("salted count-distinct equals the exact distinct per key") {
    val df = spark.range(0, 50000)
      .select((when($"id" % 10 < 9, 1L).otherwise($"id" % 7)).as("k"),
        ($"id" % 977).as("v"))
    val exact = df.groupBy("k").agg(countDistinct("v").as("n_distinct"))
    val salted = Salting.saltedCountDistinct(df, "k", "v", factor = 16)
    assert(salted.orderBy("k").collect().toSeq ==
      exact.orderBy("k").collect().toSeq)
  }
}
