package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-provided testdata directories
  * (TESTDATA.md). At cluster scale these would be catalog tables; the
  * engine takes plain paths so the same query code runs against any
  * scale-factor directory.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which the vectorized reader
    // rejects; read nanos as long and floor to micros (DuckDB does the
    // same truncation when it reads nanos into its micros timestamps).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
}

/** A named pack of oracle-checked queries: each entry in `queries` has
  * either a DuckDB-equivalent SQL in `oracle` (strong hash-compare) or a
  * documented reason it is rows-only (non-SQL-expressible).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
