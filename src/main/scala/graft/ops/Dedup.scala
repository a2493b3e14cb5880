package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based deduplication operators.
  *
  * `latestWins` is the engine's flagship compaction step: the reference
  * compacts each micro-batch to one final state per row key before merging
  * (pandas-on-Spark sort + drop_duplicates keep='last',
  * incremental_kafka_s3_cdc.py:321-325). We re-express it as a window
  * row_number — a single hash-partition shuffle on the keys, map-side
  * combinable by AQE, no driver round-trips.
  *
  * The reference's tie-break on equal `__ts_ms` was nondeterministic
  * (physical row order); we impose a total order with explicit tie-breaker
  * columns (SURVEY.md §7 risk d).
  */
object Dedup {

  /** Keep the single latest row per key: order by `ts` desc, then
    * `tieBreakers` desc. At scale this is one shuffle on `keys`; skewed hot
    * keys are handled by AQE (the window itself cannot pre-aggregate, but
    * batch sizes per key are bounded by micro-batch scope).
    */
  def latestWins(df: DataFrame, keys: Seq[String], ts: String,
                 tieBreakers: Seq[String] = Nil): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col(ts).desc +: tieBreakers.map(col(_).desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate removal by content hash: one row kept per distinct
    * `hashCols` tuple, the one with the smallest `keep` value (stable).
    * groupBy+min_by is map-side combinable — at 100 TB this is a partial
    * aggregation before the shuffle, unlike a window over all rows.
    */
  def exactByKey(df: DataFrame, keys: Seq[String], keep: String): DataFrame = {
    val others = df.columns.filterNot(c => keys.contains(c) || c == keep)
    df.groupBy(keys.map(col): _*)
      .agg(
        min(col(keep)).as(keep),
        others.map(c => min_by(col(c), col(keep)).as(c)): _*
      )
  }
}
