package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Bloom filter over the engine's shared 60-bit md5 hash
  * ([[graft.TextQueries.h64]]): `bits` bits (a power of two), k = 4
  * probe positions by Kirsch–Mitzenmacher double hashing —
  * `h1 = h mod 2^30`, `h2 = (h >>> 30) | 1` (odd), `pos_i = (h1 + i·h2)
  * mod bits` — so the width adapts to the build side without being
  * capped by hash-slice arithmetic (every position derives from the
  * same two 30-bit halves).
  *
  * Like [[HllAggregator]] — and unlike Spark's private
  * `BloomFilterAggregate` layout — every step is plain integer
  * arithmetic on the shared hash, so a DuckDB oracle recomputes the
  * IDENTICAL set-bit set with `%`/`//`/`|` and membership verdicts
  * hash-compare exactly (see `x_bloom_runtime_filter`). The width
  * follows the corpus-adaptive discipline of `adaptiveSimhashBits` /
  * `adaptiveCells`: [[adaptiveBits]] picks the smallest power of two
  * ≥ 16·n (load ≤ 1/4 per probe, false positives ≲ 1%), and the oracle
  * re-derives the same width from its own count(*).
  *
  * Scale contract: reduce sets 4 bits, merge is pointwise OR —
  * associative, commutative, idempotent — so partials combine map-side
  * and `bits/8` bytes per group cross the shuffle, never the values.
  * The finished sketch is a RUNTIME FILTER: [[containsSql]] compiles it
  * into a literal-array predicate (built-in `element_at`/`%`/`&` ops,
  * whole-stage-codegen'd), so probing the big side is scan-local — no
  * join, no shuffle, no state; rows that fail never reach the exchange.
  * At the 65536-bit cap the literal is 8 KB inside the plan; a build
  * side beyond ~4k keys per filter should shard (one filter per
  * partition bucket) rather than grow the literal further.
  */
class BloomAggregator(val bits: Int = 4096)
  extends Aggregator[Long, Array[Long], Array[Long]] {
  import BloomAggregator._
  require(bits >= MinBits && bits <= MaxBits && (bits & (bits - 1)) == 0,
    s"bits must be a power of two in [$MinBits, $MaxBits]: $bits")

  private val words = bits / 64

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(acc: Array[Long], hash: Long): Array[Long] = {
    val h1 = hash & ((1L << 30) - 1)
    val h2 = (hash >>> 30) | 1L
    var i = 0
    while (i < K) {
      val pos = ((h1 + i * h2) % bits).toInt
      acc(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(acc: Array[Long]): Array[Long] = acc

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomAggregator {
  /** Probe count. */
  val K = 4
  val MinBits = 4096
  val MaxBits = 65536

  /** Corpus-adaptive width: smallest power of two ≥ 16·n keys, clamped
    * to [[MinBits]]..[[MaxBits]] — per-probe load ≤ 1/4 within the
    * range, so the false-positive rate stays ≲ (1 - e^(-1/4))^4 ≈ 0.2%
    * until the cap. MUST stay in lockstep with the oracle's CASE chain
    * in `x_bloom_runtime_filter`.
    */
  def adaptiveBits(n: Long): Int = {
    var b = MinBits
    while (b < MaxBits && 16L * n > b) b <<= 1
    b
  }

  /** Membership test of hash expression `h` (an h64 SQL expression)
    * against a FINISHED sketch, as a pure built-in-function SQL
    * predicate over the literal words — codegen'd, scan-local,
    * broadcast-free (the literal ships inside the serialized plan;
    * Catalyst's subexpression elimination dedups the repeated halves).
    */
  def containsSql(wordsArr: Array[Long], h: String): String = {
    val bits = wordsArr.length * 64
    val arr = wordsArr.map(w => s"${w}L").mkString("array(", ",", ")")
    val h1 = s"(($h) & ${(1L << 30) - 1})"
    val h2 = s"((shiftright($h, 30)) | 1)"
    (0 until K).map { i =>
      val pos = s"(($h1 + $i * $h2) % $bits)"
      s"((shiftright(element_at($arr, CAST(shiftright($pos, 6) AS INT) + 1), " +
        s"CAST($pos & 63 AS INT)) & 1) = 1)"
    }.mkString("(", " AND ", ")")
  }

  /** Number of set bits in a finished sketch. */
  def bitsSet(words: Array[Long]): Long =
    words.map(java.lang.Long.bitCount(_).toLong).sum
}
