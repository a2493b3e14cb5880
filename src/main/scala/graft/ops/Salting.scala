package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: spread a hot join key over `factor`
  * reducers by appending a deterministic salt to the big side's key and
  * replicating the small side `factor` times.
  *
  * AQE's skew-join handles most cases at runtime (and stays on for this
  * engine); explicit salting remains the tool when a single key exceeds
  * what one task can hold even after AQE splitting, or when the skewed
  * operator is an aggregation (salt -> partial agg -> de-salt final agg).
  * The salt is a hash of the big side's row content — deterministic, no
  * rand(), so plans stay replayable and oracle-checkable.
  */
object Salting {

  private val SaltCol = "__salt"

  /** Inner equi-join `big ⋈ small` on `key`, salted `factor` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    val saltedBig = big.withColumn(
      SaltCol, pmod(hash(big.columns.map(col): _*), lit(factor)))
    val replicatedSmall = small.withColumn(
      SaltCol, explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(replicatedSmall, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Skewed aggregation: count/sum per key in two phases — partial by
    * (key, salt), final by key. Map-side combine already does this for
    * algebraic aggregates; the explicit form exists for aggregations that
    * are not partial-aggregable as-is (e.g. exact distinct per hot key:
    * salt by the distinct column itself).
    */
  def saltedCountDistinct(df: DataFrame, key: String, distinctCol: String,
                          factor: Int): DataFrame = {
    val partial = df
      .withColumn(SaltCol, pmod(hash(col(distinctCol)), lit(factor)))
      .groupBy(col(key), col(SaltCol))
      .agg(countDistinct(col(distinctCol)).as("__part"))
    partial.groupBy(col(key))
      .agg(sum(col("__part")).as("n_distinct"))
  }
}
