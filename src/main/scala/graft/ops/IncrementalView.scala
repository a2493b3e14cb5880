package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view refresh from a change data feed: keep a
  * grouped count/sum aggregate of a [[CdcTable]] current by applying the
  * CDF delta between two versions ([[CdcTable.changesBetween]]) instead
  * of recomputing from the full table.
  *
  * Counts and sums are algebraic with signed contributions — an insert
  * or update-postimage adds a row's values, a delete or update-preimage
  * subtracts them — so the refreshed aggregate is EXACTLY the full
  * recompute (spec-verified), while the work per refresh scales with the
  * delta: one combine-friendly groupBy over the feed plus one keyed
  * outer join against the (group-cardinality-sized) aggregate. At 100 TB
  * this is the difference between re-scanning the table per refresh and
  * touching only what changed — the same merge-of-partials argument as
  * oracle query `x_incremental_agg`, driven here by the table's own
  * version history.
  */
object IncrementalView {

  val CountCol = "n_rows"

  /** The full (bootstrap) computation: per-`groupCols` row count and
    * sums of `sumCols`. The refreshed aggregate always equals this run
    * over the corresponding version.
    */
  def compute(table: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame =
    table.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as(CountCol),
      sumCols.map(c => sum(col(c)).as(c)): _*)

  /** Apply the change feed `changes` (the [[CdcTable.changesBetween]]
    * output covering exactly the versions between the aggregate's
    * snapshot and the target) to `agg`. Groups whose row count reaches
    * zero vanish, like a recompute would drop them.
    */
  def refresh(agg: DataFrame, changes: DataFrame,
              groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val sign = when(
      col(CdcTable.ChangeTypeCol).isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val delta = changes.withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__sign")).as("__dn"),
        sumCols.map(c => sum(col(c) * col("__sign")).as(s"__d_$c")): _*)

    val joined = agg.join(delta, groupCols, "full_outer")
    val refreshed = joined.select(
      (groupCols.map(col) :+
        (coalesce(col(CountCol), lit(0L)) + coalesce(col("__dn"), lit(0L))).as(CountCol)) ++
        sumCols.map { c =>
          // a side absent for this group contributes 0, not null (type
          // coercion lifts the integer literal to the sum's type)
          (coalesce(col(c), lit(0)) + coalesce(col(s"__d_$c"), lit(0))).as(c)
        }: _*)
    refreshed.filter(col(CountCol) > 0)
  }
}
