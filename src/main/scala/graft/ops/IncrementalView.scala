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
    * over the corresponding version. Sum convention: null values
    * contribute nothing and an all-null group sums to 0 (not null) —
    * the convention that makes signed delta application exact, stated
    * here so compute and refresh agree bit-for-bit.
    */
  def compute(table: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame =
    table.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as(CountCol),
      sumCols.map(c => coalesce(sum(col(c)), lit(0)).as(c)): _*)

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

    // null-safe join: a null group KEY is a legitimate group (compute's
    // groupBy treats all nulls as one group), so the join must match on
    // <=>, not =, or null-keyed groups double up instead of merging
    val a = agg.alias("a")
    val d = delta.alias("d")
    val joinCond = groupCols.map(k => col(s"a.$k") <=> col(s"d.$k")).reduce(_ && _)
    val joined = a.join(d, joinCond, "full_outer")
    val refreshed = joined.select(
      (groupCols.map(k => coalesce(col(s"a.$k"), col(s"d.$k")).as(k)) :+
        (coalesce(col(s"a.$CountCol"), lit(0L)) + coalesce(col("d.__dn"), lit(0L))).as(CountCol)) ++
        sumCols.map { c =>
          // a side absent for this group contributes 0, matching the
          // null-sums-to-0 convention of compute()
          (coalesce(col(s"a.$c"), lit(0)) + coalesce(col(s"d.__d_$c"), lit(0))).as(c)
        }: _*)
    refreshed.filter(col(CountCol) > 0)
  }
}
