package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact-integer face of a finished HLL sketch: the scaled harmonic sum
  * `Σ_buckets 2^(53 - register)` (an exact BIGINT — empty registers
  * contribute 2^53, so S ≤ 256·2^53 < 2^63) and the count of empty
  * registers. The cardinality estimate is ONE double division away
  * (`α·m²·2^53 / S`), deliberately left to the query layer so Spark and
  * DuckDB compute it from identical SQL text on identical integers —
  * bit-identical results, no cross-engine libm drift inside the
  * aggregator.
  */
final case class HllSummary(hll_sum: Long, hll_zeros: Int)

/** Mergeable HyperLogLog distinct-count sketch over the engine's shared
  * 60-bit md5 hash ([[graft.TextQueries.h64]]): 256 one-byte registers,
  * bucket = low 8 hash bits, register = max over values of
  * `53 - bitlength(hash >> 8)` (the leading-zero rank of the remaining
  * 52 bits, 53 for a zero remainder).
  *
  * Unlike Spark's built-in `approx_count_distinct` (whose HLL++ register
  * layout is private and engine-specific — its oracle can only be a
  * tolerance boolean, see `x_approx_sketches`), every step here is
  * plain integer arithmetic on the shared hash, so a DuckDB oracle
  * recomputes the IDENTICAL registers with `bin()`/`<<` and the result
  * hash-compares exactly.
  *
  * Scale contract: reduce and merge are pointwise byte-max — associative,
  * commutative, idempotent. The union of two sketches IS the sketch of
  * the union, so partials combine map-side (2 KB per group crosses the
  * shuffle, never the values), shards/days/streams merge by register
  * max, and the same state serves a streaming checkpoint. Raw HLL only:
  * no small-range linear-counting branch (it needs a cross-engine ln);
  * `hll_zeros` is exposed so a caller can detect the n ≲ 2.5·m regime
  * where the raw estimate is biased.
  */
class HllAggregator extends Aggregator[Long, Array[Byte], HllSummary] {
  import HllAggregator._

  override def zero: Array[Byte] = new Array[Byte](M)

  override def reduce(regs: Array[Byte], hash: Long): Array[Byte] = {
    val h = hash & ((1L << 60) - 1) // h64 is 60-bit non-negative; mask defensively
    val bucket = (h & (M - 1)).toInt
    val w = h >>> BucketBits
    val rho = (if (w == 0L) MaxRho else MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
    if (rho > regs(bucket)) regs(bucket) = rho
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(regs: Array[Byte]): HllSummary = {
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < M) {
      s += 1L << (MaxRho - regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    HllSummary(s, zeros)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[HllSummary] = Encoders.product[HllSummary]
}

object HllAggregator {
  /** Register count (2^BucketBits). */
  val M = 256
  val BucketBits = 8
  /** Rank of a zero 52-bit remainder: 52 payload bits + 1. */
  val MaxRho = 53

  /** The estimate SQL over a finished summary — textually identical in
    * Spark and DuckDB (same literals, same operator order → the same
    * IEEE doubles → the same floor): `α₂₅₆ · 256² · 2^53 / S`.
    */
  def estimateSql(sumCol: String): String =
    s"CAST(FLOOR(0.7213 / (1 + 1.079 / 256) * 256 * 256 * 9007199254740992 / CAST($sumCol AS DOUBLE)) AS BIGINT)"
}
