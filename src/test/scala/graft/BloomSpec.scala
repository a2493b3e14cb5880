package graft

import graft.functions.BloomAggregator
import org.apache.spark.sql.functions._

/** BloomAggregator: bit layout matches the documented 4x12-bit-slice
  * rule, merge is pointwise OR (partials equal the whole, replays are
  * no-ops), the filter is SOUND (every inserted key passes), and the
  * compiled containsSql predicate agrees with driving the bit test by
  * hand — the properties the x_bloom_runtime_filter oracle relies on.
  */
class BloomSpec extends SparkSpec {

  private def h64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 15), 16)
  }

  private def sketch(values: Seq[String]): Array[Long] = {
    val agg = new BloomAggregator
    values.foldLeft(agg.zero)((b, v) => agg.reduce(b, h64(v)))
  }

  private def handContains(words: Array[Long], h: Long): Boolean =
    (0 until BloomAggregator.K).forall { i =>
      val pos = ((h >>> (BloomAggregator.SliceBits * i)) &
        (BloomAggregator.Bits - 1)).toInt
      (words(pos >>> 6) >>> (pos & 63) & 1L) == 1L
    }

  test("reduce sets exactly the 4 slice positions of the hash") {
    val agg = new BloomAggregator
    // hand-built hash: slices 1, 2, 3, 4 -> positions 1, 2, 3, 4
    val h = 1L | (2L << 12) | (3L << 24) | (4L << 36)
    val b = agg.reduce(agg.zero, h)
    assert(BloomAggregator.bitsSet(b) == 4)
    assert((0 until 4).forall(p => (b(0) >>> (p + 1) & 1L) == 1L))
    // colliding slices set fewer DISTINCT bits, never more
    val same = agg.reduce(agg.zero, 7L | (7L << 12) | (7L << 24) | (7L << 36))
    assert(BloomAggregator.bitsSet(same) == 1)
  }

  test("merge of partials equals the sketch of the union; duplicates are no-ops") {
    val agg = new BloomAggregator
    val xs = (1 to 400).map(i => s"k$i")
    val ys = (200 to 700).map(i => s"k$i")
    val whole = sketch(xs ++ ys)
    val merged = agg.merge(sketch(xs), sketch(ys))
    assert(merged.toSeq == whole.toSeq)
    assert(sketch(xs ++ xs).toSeq == sketch(xs).toSeq)
  }

  test("sound: every inserted key passes; false positives stay near theory") {
    val keys = (1 to 500).map(i => s"member-$i")
    val words = sketch(keys)
    assert(keys.forall(k => handContains(words, h64(k))))
    val others = (1 to 4000).map(i => s"other-$i")
    val fp = others.count(o => handContains(words, h64(o)))
    // expected (1 - e^(-4*500/4096))^4 ~ 2.3% -> ~94 of 4000; allow 3x
    assert(fp < 300, s"false positives $fp of 4000")
  }

  test("containsSql over the literal sketch equals the hand bit test") {
    val sq = spark
    import sq.implicits._
    val words = sketch((1 to 300).map(i => s"m$i"))
    val probe = ((1 to 300).map(i => s"m$i") ++ (1 to 300).map(i => s"x$i"))
    val df = probe.map(v => (v, h64(v))).toDF("k", "h")
      .withColumn("pass", expr(BloomAggregator.containsSql(words, "h")))
    val got = df.collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    probe.foreach { v =>
      assert(got(v) == handContains(words, h64(v)), s"disagree on $v")
    }
    assert((1 to 300).forall(i => got(s"m$i")), "soundness through the SQL path")
  }

  test("grouped typed aggregation equals driving the aggregator by hand") {
    val sq = spark
    import sq.implicits._
    val rows = (1 to 1000).map(i => (s"g${i % 3}", s"v${i % 250}"))
    val df = rows.toDF("g", "k")
      .selectExpr("g", s"${TextQueries.h64("k")} AS h")
    val bloom = udaf(new BloomAggregator, org.apache.spark.sql.Encoders.scalaLong)
    val got = df.groupBy("g")
      .agg(bloom(col("h")).as("bloom"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    (0 until 3).foreach { g =>
      val expect = sketch(rows.filter(_._1 == s"g$g").map(_._2).distinct)
      assert(got(s"g$g").toSeq == expect.toSeq, s"group g$g")
    }
  }
}
