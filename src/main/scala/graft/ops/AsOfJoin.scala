package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with the
  * same key and right.time <= left.time (inclusive). The canonical
  * time-series enrichment operator (trades->quotes, events->state).
  *
  * Spark has no built-in as-of join; the naive formulations are a range
  * join (quadratic blow-up per key) or a per-left-row subquery. This
  * implementation is the sort-based single-shuffle form, composed from
  * built-ins per the engine's preference order (SURVEY §7):
  *
  *   1. tag both sides and union them (no join node at all);
  *   2. one hash partition + sort per key on (time, side, tie);
  *   3. window `last(right-struct, ignoreNulls)` carries the most recent
  *      whole right row forward (struct-packed, so columns can never mix
  *      across right rows even when they contain nulls);
  *   4. keep the left rows and unpack.
  *
  * Cost at scale: ONE shuffle of |L|+|R| rows — same as a plain equi-join
  * — regardless of how many right rows precede each left row. Ties on
  * time resolve right-before-left (inclusive <=), then by `rightTieBreak`
  * so the latest right row wins deterministically.
  */
object AsOfJoin {

  /** @param left          left (probe) side
    * @param right         right (state/quote) side
    * @param key           equi-key column name present on both sides
    * @param leftTime      event-time column on the left
    * @param rightTime     event-time column on the right
    * @param rightCols     right columns to attach (null when no prior row)
    * @param rightTieBreak numeric column breaking equal-time right rows
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String], rightTieBreak: String): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, rightCols, rightTieBreak,
      forward = false)

  /** Forward as-of: for every left row, attach the EARLIEST right row
    * with the same key and right.time >= left.time (inclusive) — the
    * "next state change after this event" lookup. Same single-shuffle
    * union+window machinery scanning time DESCENDING: the last right row
    * seen when the scan reaches a left row is the smallest right time at
    * or above it. Equal-time right rows resolve to the smallest
    * `rightTieBreak` (the first such row), mirroring backward's latest.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      rightCols: Seq[String], rightTieBreak: String): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, rightCols, rightTieBreak,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String,
                       rightCols: Seq[String], rightTieBreak: String,
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))

    // side 0 = right (sorts first at equal time => inclusive <=), 1 = left
    val taggedRight = right.select(
      (col(key) +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        col(rightTieBreak).cast("long").as("__tie") +:
        struct(rightCols.map(col): _*).as("__r") +:
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(key) +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        lit(Long.MaxValue).as("__tie") +:
        lit(null).cast(rStructType).as("__r") +:
        leftCols.filterNot(_ == key).map(col)): _*)

    // scan ascending (backward as-of) or descending (forward as-of); in
    // both, a right row at the same time sorts before the left row it
    // serves (inclusive bound), and the tie order makes "last seen" the
    // latest (backward) / first (forward) right row at equal times
    val w = (if (forward)
      Window.partitionBy(col(key))
        .orderBy(col("__t").desc, col("__side"), col("__tie").desc)
    else
      Window.partitionBy(col(key))
        .orderBy(col("__t"), col("__side"), col("__tie")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))

    carried.filter(col("__side") === 1)
      .select(
        (leftCols.map(col) ++ rightCols.map(c => col("__c").getField(c).as(c))): _*)
  }
}
