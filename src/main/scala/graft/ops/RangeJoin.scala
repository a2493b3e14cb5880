package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval × point) join: pair every interval row
  * `[start, end]` with every point row of the same key whose timestamp
  * falls inside the interval — the "events within N minutes of each
  * alert", "reads inside each session window", "facts inside each
  * campaign flight" operator.
  *
  * Spark plans a raw `L.key = R.key AND R.ts BETWEEN L.start AND L.end`
  * as an equi-join on the key with the band as a POST-JOIN filter: every
  * (interval, point) pair sharing a key materializes before the band
  * prunes, which is quadratic per key — the classic range-join blow-up
  * (a user with 10k intervals × 100k events builds 10^9 pairs to keep a
  * few thousand). This implementation is the bucketized equi-join form:
  *
  *   1. pick a bucket width W (micros); a point belongs to exactly ONE
  *      bucket `floor(ts / W)`;
  *   2. each interval EXPLODES to the `(end-start)/W + 1` buckets it
  *      overlaps (one integer `sequence()`, no data copied — for
  *      intervals bounded by a few W this is O(1) rows per interval);
  *   3. equi-join on (key, bucket) — a plain hash shuffle both sides —
  *      then the exact band predicate as a residual filter.
  *
  * Every qualifying pair matches EXACTLY once (the point's bucket is
  * unique), so there is no post-dedup. Cost at scale: one hash exchange
  * of |points| + |intervals|·buckets_per_interval rows; candidate pairs
  * per bucket are bounded by the key×bucket co-occupancy instead of the
  * whole key history, which is what keeps the operator linear at 100 TB.
  * Choose W near the typical interval length: wider W admits more
  * false candidates per bucket, narrower W explodes more interval rows;
  * both degrade gracefully, neither is quadratic.
  *
  * An interval far longer than W (a month-long interval over 1-minute
  * buckets) would explode to tens of thousands of rows; `maxBuckets`
  * fails loudly per row before that silently dominates the plan — raise
  * it (or widen W) deliberately, not by accident. Intervals with
  * `end < start`, or with a NULL key/endpoint, match nothing (SQL band
  * semantics); points with NULL key or ts match nothing.
  */
object RangeJoin {

  /** @param intervals  interval side, carrying `start`/`end` timestamp columns
    * @param points     point side, carrying the `ts` timestamp column
    * @param keys       equi-key column names present on both sides
    * @param start      interval lower-bound column (timestamp, on `intervals`)
    * @param end        interval upper-bound column (timestamp, on `intervals`)
    * @param ts         point timestamp column (on `points`)
    * @param bucketMicros bucket width W in microseconds (e.g. the interval length)
    * @param includeStart whether `ts = start` qualifies (default true)
    * @param includeEnd   whether `ts = end` qualifies (default false: `[start, end)`)
    * @param maxBuckets   per-interval explode guard — an interval spanning more
    *                     than this many buckets fails the job loudly
    * @return one row per qualifying (interval, point) pair: all interval
    *         columns plus the point's non-key columns
    */
  def intervalJoin(intervals: DataFrame, points: DataFrame, keys: Seq[String],
                   start: String, end: String, ts: String,
                   bucketMicros: Long,
                   includeStart: Boolean = true, includeEnd: Boolean = false,
                   maxBuckets: Int = 64): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive, got $bucketMicros")
    val overlap = (intervals.columns.toSet -- keys)
      .intersect(points.columns.toSet -- keys)
    require(overlap.isEmpty,
      s"non-key columns ${overlap.toSeq.sorted.mkString("[", ",", "]")} exist on " +
        "both sides — rename one side before the join, the pair output keeps both")

    val Bucket = "__range_bucket"
    // exact floor(ts/W) in integer space: pmod is non-negative, so the
    // numerator is the largest multiple of W at or below ts for negative
    // epochs too; |result| < 2^53 keeps the long cast exact
    def bucketOf(c: Column): Column = {
      val ux = unix_micros(c)
      ((ux - pmod(ux, lit(bucketMicros))) / lit(bucketMicros)).cast("long")
    }

    val b0 = bucketOf(col(start))
    val b1 = bucketOf(col(end))
    val exploded = intervals
      .filter(col(start).isNotNull && col(end).isNotNull && col(start) <= col(end))
      .withColumn(Bucket, explode(sequence(b0,
        when(b1 - b0 < lit(maxBuckets.toLong), b1).otherwise(raise_error(concat(
          lit(s"range interval spans more than $maxBuckets buckets of " +
            s"${bucketMicros}us ("), (b1 - b0 + 1).cast("string"),
          lit(s") — widen bucketMicros or raise maxBuckets on [$start, $end]")))))))
    val bucketed = points.withColumn(Bucket, bucketOf(col(ts)))

    val lower = if (includeStart) col(ts) >= col(start) else col(ts) > col(start)
    val upper = if (includeEnd) col(ts) <= col(end) else col(ts) < col(end)
    exploded.join(bucketed, keys :+ Bucket)
      .filter(lower && upper)
      .drop(Bucket)
  }

  /** Interval × interval OVERLAP join: pair every left interval
    * `[startA, endA)` with every right interval `[startB, endB)` of the
    * same key that overlaps it (`startA < endB AND startB < endA`,
    * half-open semantics — touching endpoints do not overlap).
    *
    * Same bucketized machinery as [[intervalJoin]] with BOTH sides
    * exploding to their covered buckets; a pair sharing several buckets
    * would match once per shared bucket, so each pair is CLAIMED by
    * exactly one bucket — the one containing `max(startA, startB)`
    * (both intervals cover it when they overlap, and it is unique) —
    * making the join exactly-once with no post-dedup shuffle.
    *
    * Degenerate inputs follow [[intervalJoin]]: NULL keys/endpoints and
    * inverted intervals match nothing; zero-length intervals overlap
    * nothing under half-open semantics. `maxBuckets` guards both sides.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                          startA: String, endA: String,
                          startB: String, endB: String,
                          bucketMicros: Long,
                          maxBuckets: Int = 64): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive, got $bucketMicros")
    val overlapCols = (left.columns.toSet -- keys)
      .intersect(right.columns.toSet -- keys)
    require(overlapCols.isEmpty,
      s"non-key columns ${overlapCols.toSeq.sorted.mkString("[", ",", "]")} exist " +
        "on both sides — rename one side before the join, the pair output keeps both")

    val Bucket = "__range_bucket"
    def bucketOf(c: Column): Column = {
      val ux = unix_micros(c)
      ((ux - pmod(ux, lit(bucketMicros))) / lit(bucketMicros)).cast("long")
    }
    def explodeSide(df: DataFrame, s: String, e: String): DataFrame = {
      val b0 = bucketOf(col(s))
      val b1 = bucketOf(col(e))
      df.filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
        .withColumn(Bucket, explode(sequence(b0,
          when(b1 - b0 < lit(maxBuckets.toLong), b1).otherwise(raise_error(concat(
            lit(s"range interval spans more than $maxBuckets buckets of " +
              s"${bucketMicros}us ("), (b1 - b0 + 1).cast("string"),
            lit(s") — widen bucketMicros or raise maxBuckets on [$s, $e]")))))))
    }

    explodeSide(left, startA, endA).join(explodeSide(right, startB, endB), keys :+ Bucket)
      .filter(col(startA) < col(endB) && col(startB) < col(endA) &&
        col(Bucket) === bucketOf(greatest(col(startA), col(startB))))
      .drop(Bucket)
  }
}
