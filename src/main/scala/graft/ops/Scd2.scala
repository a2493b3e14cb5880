package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance: a dimension table that
  * keeps every historical attribute version as a row with a
  * `[valid_from, valid_to)` interval (`valid_to` null = current), updated
  * incrementally from observation batches — the standard warehouse shape
  * for "what did this row look like at time T".
  *
  * The batch face (full-history rebuild) is oracle query
  * `x_scd2_history`; this operator is the INCREMENTAL form a pipeline
  * runs per batch: one keyed join of the dimension's current rows
  * against the batch (broadcastable when the batch is small), no history
  * rewrite — closed and historical rows stream through untouched, which
  * at 100 TB means per-batch cost scales with the batch and the current
  * row set, never with accumulated history.
  */
object Scd2 {

  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"

  /** Initialize a dimension from a first observation batch: one current
    * row per key, `valid_from` = the observation time.
    */
  def init(batch: DataFrame, keys: Seq[String], tsCol: String): DataFrame = {
    val attrs = batch.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    batch.select(
      (keys.map(col) ++ attrs.map(col) :+
        col(tsCol).as(ValidFrom) :+
        lit(null).cast(batch.schema(tsCol).dataType).as(ValidTo)): _*)
  }

  /** Apply one observation batch (one row per key — latest-wins dedup
    * upstream) to the dimension:
    *
    *   - key present, attributes CHANGED: the current row closes
    *     (`valid_to` = observation time) and a new current row appends
    *   - key present, attributes unchanged: no-op (no spurious versions)
    *   - new key: a new current row appends
    *   - historical (already-closed) rows pass through untouched
    *
    * An observation at or before the current row's `valid_from` is
    * ignored for that key (a replayed batch cannot regress or duplicate
    * history — same late-data policy as [[CdcMerge.mergeGuarded]]).
    */
  def apply(dim: DataFrame, batch: DataFrame, keys: Seq[String], tsCol: String): DataFrame = {
    val attrs = dim.columns.filterNot(c => keys.contains(c) || c == ValidFrom || c == ValidTo).toSeq
    require(attrs.forall(batch.columns.contains),
      s"batch must carry every dimension attribute: ${attrs.mkString(", ")}")

    val closed = dim.filter(col(ValidTo).isNotNull)
    // explicit presence markers: after the full-outer join, side presence
    // cannot be inferred from nullable data columns (a null valid_from or
    // a null observation time would masquerade as an absent side and
    // fabricate an all-null "current" row). Observations without a time
    // cannot be sequenced and are dropped up front.
    val current = dim.filter(col(ValidTo).isNull).withColumn("__d_present", lit(true))

    val b = batch.na.drop(Seq(tsCol)).select(
      (keys.map(col) ++ attrs.map(c => col(c).as(s"__b_$c")) :+
        col(tsCol).as("__b_ts") :+ lit(true).as("__b_present")): _*)
    val j = current.join(b, keys, "full_outer")

    val inDim = coalesce(col("__d_present"), lit(false))
    val inBatch = coalesce(col("__b_present"), lit(false))
    val changed = attrs
      .map(c => !(col(c) <=> col(s"__b_$c")))
      .foldLeft(lit(false))(_ || _)
    val advances = inBatch && (!inDim || col("__b_ts") > col(ValidFrom))

    // each joined row contributes its surviving versions: the (possibly
    // closed) pre-existing current row, and/or the new current row
    def oldRow(to: org.apache.spark.sql.Column) = struct(
      (keys.map(col) ++ attrs.map(col) :+ col(ValidFrom).as(ValidFrom) :+
        to.cast(dim.schema(ValidTo).dataType).as(ValidTo)): _*)
    val newRow = struct(
      (keys.map(col) ++ attrs.map(c => col(s"__b_$c").as(c)) :+
        col("__b_ts").as(ValidFrom) :+
        lit(null).cast(dim.schema(ValidTo).dataType).as(ValidTo)): _*)

    val versions = when(!inDim && inBatch, array(newRow))
      .when(inDim && advances && changed, array(oldRow(col("__b_ts")), newRow))
      .otherwise(array(oldRow(lit(null)))) // unchanged, stale, or batch-absent

    val out = j.select(explode(versions).as("__v"))
      .select((keys ++ attrs :+ ValidFrom :+ ValidTo).map(c => col(s"__v.$c").as(c)): _*)
    closed.select(out.columns.map(col): _*).unionAll(out)
  }
}
