package graft

import graft.functions.{HllAggregator, HllSummary}
import org.apache.spark.sql.functions._

/** HllAggregator: register math matches the documented rule, merge is a
  * pointwise max (so partials equal the whole and replays are
  * idempotent), and the estimate lands within HLL's theoretical error on
  * a known cardinality.
  */
class HllSpec extends SparkSpec {

  private def h64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 15), 16)
  }

  private def sketch(values: Seq[String]): Array[Byte] = {
    val agg = new HllAggregator
    values.foldLeft(agg.zero)((b, v) => agg.reduce(b, h64(v)))
  }

  test("registers: bucket = low 8 bits, rho = 53 - bitlength(remainder)") {
    val agg = new HllAggregator
    // hand-picked hash: bucket 5, remainder 1 (rho 52)
    val b1 = agg.reduce(agg.zero, (1L << 8) | 5L)
    assert(b1(5) == 52 && b1.count(_ != 0) == 1)
    // zero remainder takes the max rank 53
    val b2 = agg.reduce(agg.zero, 7L)
    assert(b2(7) == 53)
    // a larger remainder has smaller rho and must NOT displace a higher register
    val b3 = agg.reduce(b1, (3L << 8) | 5L) // remainder 3 -> rho 51, same bucket
    assert(b3(5) == 52)
  }

  test("merge of partials equals the sketch of the union; duplicates are no-ops") {
    val agg = new HllAggregator
    val xs = (1 to 5000).map(i => s"u$i")
    val ys = (2500 to 9000).map(i => s"u$i") // overlaps xs
    val whole = sketch(xs ++ ys)
    val merged = agg.merge(sketch(xs), sketch(ys))
    assert(merged.toSeq == whole.toSeq)
    assert(sketch(xs ++ xs).toSeq == sketch(xs).toSeq)
  }

  test("estimate within theoretical error (~6.5% stderr at m=256) on known cardinality") {
    val agg = new HllAggregator
    val n = 20000
    val HllSummary(s, zeros) = agg.finish(sketch((1 to n).map(i => s"item-$i")))
    assert(zeros == 0, "at n >> m every bucket should be hit")
    val est = 0.7213 / (1 + 1.079 / 256) * 256 * 256 * 9007199254740992.0 / s.toDouble
    assert(math.abs(est / n - 1.0) < 0.15, s"estimate $est for true $n")
  }

  test("udaf grouped sketch equals driving the aggregator by hand") {
    val sq = spark
    import sq.implicits._
    val agg = new HllAggregator
    val df = (1 to 3000).map(i => (s"g${i % 2}", s"v${i % 700}")).toDF("g", "k")
      .withColumn("hv", expr(graft.TextQueries.h64("k")))
    val hll = udaf(agg, org.apache.spark.sql.Encoders.scalaLong)
    val got = df.groupBy("g").agg(hll(col("hv")).as("sk"))
      .select(col("g"), col("sk.hll_sum"), col("sk.hll_zeros"))
      .as[(String, Long, Int)].collect().map { case (g, s, z) => g -> ((s, z)) }.toMap
    val want = (1 to 3000).map(i => (s"g${i % 2}", s"v${i % 700}")).distinct
      .groupBy(_._1).map { case (g, vs) =>
        val HllSummary(s, z) = agg.finish(sketch(vs.map(_._2)))
        g -> ((s, z))
      }
    assert(got == want)
  }
}
