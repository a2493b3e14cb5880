package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Bloom filter over the engine's shared 60-bit md5 hash
  * ([[graft.TextQueries.h64]]): 4096 bits (64 longs), k = 4 probe
  * positions cut from disjoint 12-bit slices of the hash
  * (`pos_i = (h >>> 12·i) & 4095`).
  *
  * Like [[HllAggregator]] — and unlike Spark's private
  * `BloomFilterAggregate` layout — every step is plain integer
  * arithmetic on the shared hash, so a DuckDB oracle recomputes the
  * IDENTICAL set-bit set with `>>`/`&` and membership verdicts
  * hash-compare exactly (see `x_bloom_runtime_filter`).
  *
  * Scale contract: reduce sets 4 bits, merge is pointwise OR —
  * associative, commutative, idempotent — so partials combine map-side
  * and 512 bytes per group cross the shuffle, never the values. The
  * finished sketch is a RUNTIME FILTER: [[contains]] compiles it into a
  * literal-array expression (built-in `element_at`/`shiftright`/bitwise
  * ops, whole-stage-codegen'd), so probing the big side is scan-local —
  * no join, no shuffle, no state. At 100 TB the build side is one pass
  * over the small table and the probe costs four array reads per row
  * inside the scan stage; rows that fail never reach the exchange. The
  * filter is sound (no false negatives); expected false-positive rate
  * for n keys is (1 - e^(-4n/4096))^4 — ~2.4% at n = 512, so size
  * SLICES up (more words via a wider aggregator) when the build side
  * outgrows ~1k keys per filter.
  */
class BloomAggregator extends Aggregator[Long, Array[Long], Array[Long]] {
  import BloomAggregator._

  override def zero: Array[Long] = new Array[Long](Words)

  override def reduce(words: Array[Long], hash: Long): Array[Long] = {
    var i = 0
    while (i < K) {
      val pos = ((hash >>> (SliceBits * i)) & (Bits - 1)).toInt
      words(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
    words
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(words: Array[Long]): Array[Long] = words

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomAggregator {
  /** Filter width in bits (2^12 — each probe position is one 12-bit hash slice). */
  val Bits = 4096
  val Words: Int = Bits / 64
  /** Probe count; K·SliceBits = 48 ≤ the hash's 60 bits. */
  val K = 4
  val SliceBits = 12

  /** Membership test of hash expression `h` (an h64 SQL expression)
    * against a FINISHED sketch, as a pure built-in-function SQL
    * predicate over the literal words — codegen'd, scan-local,
    * broadcast-free (the 512-byte literal ships inside the serialized
    * plan like any literal; Catalyst's subexpression elimination dedups
    * the repeated position term).
    */
  def containsSql(words: Array[Long], h: String): String = {
    val arr = words.map(w => s"${w}L").mkString("array(", ",", ")")
    (0 until K).map { i =>
      val pos = s"(shiftright($h, ${SliceBits * i}) & ${Bits - 1})"
      s"((shiftright(element_at($arr, CAST(shiftright($pos, 6) AS INT) + 1), " +
        s"CAST($pos & 63 AS INT)) & 1) = 1)"
    }.mkString("(", " AND ", ")")
  }

  /** Number of set bits in a finished sketch. */
  def bitsSet(words: Array[Long]): Long =
    words.map(java.lang.Long.bitCount(_).toLong).sum
}
