package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering: interleave the bits of
  * several bucketized dimensions into one integer sort key, then
  * range-partition and sort by it. Files written from the result are
  * simultaneously tight on EVERY clustered dimension — min/max row-group
  * stats prune scans filtered on any of them — where a linear sort is
  * tight only on its leading column.
  *
  * This is the standard multi-dimensional data-skipping layout for large
  * parquet lakes (the reference pins 512 MB target files and hash
  * distribution in `incremental_kafka_s3_cdc.py:131-137`; z-ordering is
  * the layout step it leaves to table services). At 100 TB the cost is
  * one range-exchange + local sort — the same shape as any ordered
  * write — and the benefit is file-level pruning on every query
  * dimension, which no single-column sort provides.
  *
  * All arithmetic is integer shifts/masks on already-bucketized
  * dimensions (caller maps raw values into `[0, 2^bits)`), so the key is
  * deterministic and cross-engine reproducible.
  */
object ZOrder {

  /** Morton key: bit i of column j lands at position `i * k + j` of the
    * interleaved key (k = number of columns). Columns must already be
    * integers in `[0, 2^bits)`.
    */
  def interleave(bits: Int, cols: Column*): Column = {
    val k = cols.size
    require(k >= 1, "interleave needs at least one column")
    require(bits * k <= 62, s"interleaved key would overflow a long: $bits bits x $k cols")
    (0 until bits)
      .flatMap { i =>
        cols.zipWithIndex.map { case (c, j) =>
          shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
        }
      }
      .reduce(_ + _)
  }

  /** Cluster `df` into `numPartitions` z-order ranges of the given
    * bucketized dimension columns. Each output partition covers a
    * contiguous Morton range — a small hyper-rectangle-ish region of the
    * dimension space — so per-file min/max stats are tight on all
    * dimensions at once.
    */
  def cluster(df: DataFrame, numPartitions: Int, bits: Int, cols: Column*): DataFrame = {
    val key = interleave(bits, cols: _*)
    df.repartitionByRange(numPartitions, key).sortWithinPartitions(key)
  }

  /** Bucketize a numeric column into `[0, buckets)` by fixed width —
    * the caller-supplied normalization for [[interleave]].
    */
  def bucketize(c: Column, lo: Double, hi: Double, buckets: Int): Column = {
    require(hi > lo, s"bucketize needs hi > lo (got lo=$lo, hi=$hi): width would be <= 0 and every bucket Inf/NaN")
    require(buckets >= 1, s"bucketize needs at least one bucket (got $buckets)")
    val w = (hi - lo) / buckets
    least(lit(buckets - 1), greatest(lit(0), floor((c - lit(lo)) / lit(w)))).cast("long")
  }
}
