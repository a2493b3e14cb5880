package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A parquet-backed mergeable table: the engine's stand-in for the
  * reference's Iceberg v2 copy-on-write tables
  * (incremental_kafka_s3_cdc.py:126-148, write.delete.mode=copy-on-write).
  *
  * Layout: plain parquet under `path`, optionally hive-partitioned by a
  * derived month column `__part_month` (the reference's hidden
  * `MONTHS(created_col)` partition transform, chosen by the same heuristic:
  * a timestamp column whose name contains "create" — SURVEY.md K6).
  *
  * Scale design: merge only rewrites the partitions the batch touches —
  * the batch's distinct months prune the existing-side scan (static
  * partition pruning on a pushed-down filter) and
  * `partitionOverwriteMode=dynamic` limits the commit to those partitions.
  * This is the reference's `months(t.pc)=months(s.pc)` merge conjunct
  * (incremental_kafka_s3_cdc.py:262-264) re-expressed Spark-natively.
  * Untouched partitions are never read or written.
  *
  * Plain parquet has no optimistic concurrency (SURVEY.md §7 risk e):
  * single-writer per table is assumed, as documented.
  */
final class CdcTable(
    spark: SparkSession,
    val path: String,
    val keys: Seq[String],
    val partitionSource: Option[String] = None) {

  import CdcTable._

  private def exists: Boolean =
    new java.io.File(path).exists() &&
      new java.io.File(path).listFiles() != null &&
      new java.io.File(path).listFiles().nonEmpty

  /** Current table content (user columns only). */
  def read: DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    if (df.columns.contains(PartCol)) df.drop(PartCol) else df
  }

  private def withPart(df: DataFrame): DataFrame = partitionSource match {
    case Some(src) => df.withColumn(PartCol, date_format(col(src), "yyyy-MM"))
    case None      => df
  }

  /** Initialize (overwrite) the table with `df`. */
  def init(df: DataFrame): Unit = {
    val w = withPart(df).write.mode(SaveMode.Overwrite)
    partitionSource match {
      case Some(_) => w.partitionBy(PartCol).parquet(path)
      case None    => w.parquet(path)
    }
  }

  /** Keyless append (reference K3/K4). */
  def append(df: DataFrame): Unit = {
    val w = withPart(df).write.mode(SaveMode.Append)
    partitionSource match {
      case Some(_) => w.partitionBy(PartCol).parquet(path)
      case None    => w.parquet(path)
    }
  }

  /** MERGE a raw CDC batch: latest-wins dedup on (keys, tsCol), then
    * join-based upsert/delete, rewriting only touched partitions.
    * Idempotent: re-applying the same batch is a no-op.
    */
  def merge(batch: DataFrame, tsCol: String, tieBreakers: Seq[String] = Nil): Unit = {
    if (!exists) {
      // first batch bootstraps the table (CREATE TABLE path, K6)
      val deduped = Dedup.latestWins(batch, keys, tsCol, tieBreakers)
        .filter(col(CdcMerge.OpColumn) =!= "d")
        .drop(CdcMerge.OpColumn)
      init(deduped)
      return
    }
    val deduped = Dedup.latestWins(batch, keys, tsCol, tieBreakers)

    partitionSource match {
      case Some(src) =>
        // Partition-pruned copy-on-write: only months present in the batch
        // are read, merged, and dynamically overwritten.
        val touched = deduped
          .select(date_format(col(src), "yyyy-MM").as(PartCol))
          .distinct().as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
        val existing = spark.read.option("mergeSchema", "true").parquet(path)
          .filter(col(PartCol).isin(touched: _*))
          .drop(PartCol)
        val merged = CdcMerge.merge(existing, deduped, keys)
        val prev = spark.conf.getOption(OverwriteModeKey)
        spark.conf.set(OverwriteModeKey, "dynamic")
        try {
          withPart(merged)
            // rows may have moved partition via an updated timestamp; keep
            // the overwrite scoped to the touched input partitions anyway
            .write.mode(SaveMode.Overwrite).partitionBy(PartCol).parquet(path)
        } finally prev match {
          case Some(v) => spark.conf.set(OverwriteModeKey, v)
          case None    => spark.conf.unset(OverwriteModeKey)
        }
      case None =>
        val merged = CdcMerge.merge(read, deduped, keys).cache()
        merged.count() // materialize before overwriting the input files
        merged.write.mode(SaveMode.Overwrite).parquet(s"$path.tmp")
        merged.unpersist()
        swap(path)
    }
  }

  /** Compaction (reference K10): rewrite to `target` files per partition. */
  def compact(target: Int = 1): Unit = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    partitionSource match {
      case Some(_) =>
        val prev = spark.conf.getOption(OverwriteModeKey)
        spark.conf.set(OverwriteModeKey, "dynamic")
        try df.repartition(target, col(PartCol))
          .write.mode(SaveMode.Overwrite).partitionBy(PartCol).parquet(path)
        finally prev match {
          case Some(v) => spark.conf.set(OverwriteModeKey, v)
          case None    => spark.conf.unset(OverwriteModeKey)
        }
      case None =>
        df.repartition(target).write.mode(SaveMode.Overwrite).parquet(s"$path.tmp")
        swap(path)
    }
  }

  private def swap(p: String): Unit = {
    val dir = new java.io.File(p)
    val tmp = new java.io.File(s"$p.tmp")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(dir)
    if (!tmp.renameTo(dir))
      throw new java.io.IOException(s"atomic swap failed for $p")
  }
}

object CdcTable {
  /** Derived hive partition column (month bucket of the source ts col). */
  val PartCol = "__part_month"
  private val OverwriteModeKey = "spark.sql.sources.partitionOverwriteMode"

  /** The reference's partition-column heuristic
    * (incremental_kafka_s3_cdc.py:212-213): a non-nullable date/timestamp
    * column whose name contains "create".
    */
  def choosePartitionSource(schema: org.apache.spark.sql.types.StructType): Option[String] =
    schema.fields.find { f =>
      (f.dataType == org.apache.spark.sql.types.TimestampType ||
        f.dataType == org.apache.spark.sql.types.DateType) &&
        f.name.toLowerCase.contains("create")
    }.map(_.name)
}
