package graft

import graft.functions.BloomAggregator
import org.apache.spark.sql.functions._

/** BloomAggregator: bit layout matches the documented double-hashing
  * rule, merge is pointwise OR (partials equal the whole, replays are
  * no-ops), the filter is SOUND (every inserted key passes), the
  * compiled containsSql predicate agrees with driving the bit test by
  * hand, and the adaptive width follows the 16·n rule — the properties
  * the x_bloom_runtime_filter oracle relies on.
  */
class BloomSpec extends SparkSpec {

  private def h64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 15), 16)
  }

  private def sketch(values: Seq[String], bits: Int = 4096): Array[Long] = {
    val agg = new BloomAggregator(bits)
    values.foldLeft(agg.zero)((b, v) => agg.reduce(b, h64(v)))
  }

  private def handContains(words: Array[Long], h: Long): Boolean = {
    val bits = words.length * 64
    val h1 = h & ((1L << 30) - 1)
    val h2 = (h >>> 30) | 1L
    (0 until BloomAggregator.K).forall { i =>
      val pos = ((h1 + i * h2) % bits).toInt
      (words(pos >>> 6) >>> (pos & 63) & 1L) == 1L
    }
  }

  test("reduce sets exactly the 4 double-hash positions of the hash") {
    val agg = new BloomAggregator(4096)
    // h1 = 5, h2 = (2 << 30 >> 30) | 1 = 3 -> positions 5, 8, 11, 14
    val h = 5L | (2L << 30)
    val b = agg.reduce(agg.zero, h)
    assert(BloomAggregator.bitsSet(b) == 4)
    assert(Seq(5, 8, 11, 14).forall(p => (b(0) >>> p & 1L) == 1L))
    // h2 = 1 gives consecutive positions; h1 = h2 stride collisions
    // never set MORE than 4 distinct bits
    val b2 = agg.reduce(agg.zero, 9L)
    assert(BloomAggregator.bitsSet(b2) == 4)
  }

  test("adaptive width: smallest pow2 >= 16n within [4096, 65536]") {
    assert(BloomAggregator.adaptiveBits(0) == 4096)
    assert(BloomAggregator.adaptiveBits(256) == 4096)
    assert(BloomAggregator.adaptiveBits(257) == 8192)
    assert(BloomAggregator.adaptiveBits(512) == 8192)
    assert(BloomAggregator.adaptiveBits(3000) == 65536)
    assert(BloomAggregator.adaptiveBits(1000000) == 65536)
    intercept[IllegalArgumentException](new BloomAggregator(1000))
    intercept[IllegalArgumentException](new BloomAggregator(1 << 17))
  }

  test("merge of partials equals the sketch of the union; duplicates are no-ops") {
    val agg = new BloomAggregator(8192)
    val xs = (1 to 400).map(i => s"k$i")
    val ys = (200 to 700).map(i => s"k$i")
    val whole = sketch(xs ++ ys, 8192)
    val merged = agg.merge(sketch(xs, 8192), sketch(ys, 8192))
    assert(merged.toSeq == whole.toSeq)
    assert(sketch(xs ++ xs, 8192).toSeq == sketch(xs, 8192).toSeq)
  }

  test("sound: every inserted key passes; false positives stay near theory") {
    val keys = (1 to 500).map(i => s"member-$i")
    val bits = BloomAggregator.adaptiveBits(keys.size) // 8192
    val words = sketch(keys, bits)
    assert(keys.forall(k => handContains(words, h64(k))))
    val others = (1 to 4000).map(i => s"other-$i")
    val fp = others.count(o => handContains(words, h64(o)))
    // load 4*500/8192 ~ 0.24 -> fp ~ (1-e^-0.24)^4 ~ 0.2% -> ~8 of 4000
    assert(fp < 80, s"false positives $fp of 4000")
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
    val bloom = udaf(new BloomAggregator(4096), org.apache.spark.sql.Encoders.scalaLong)
    val got = df.groupBy("g")
      .agg(bloom(col("h")).as("bloom"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    (0 until 3).foreach { g =>
      val expect = sketch(rows.filter(_._1 == s"g$g").map(_._2).distinct)
      assert(got(s"g$g").toSeq == expect.toSeq, s"group g$g")
    }
  }
}
