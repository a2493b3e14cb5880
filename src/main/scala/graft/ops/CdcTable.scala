package graft.ops

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A parquet-backed mergeable table: the engine's stand-in for the
  * reference's Iceberg v2 copy-on-write tables
  * (incremental_kafka_s3_cdc.py:126-148, write.delete.mode=copy-on-write).
  *
  * Two layouts:
  *
  *   - '''Unpartitioned: versioned commits.''' Each merge/compact writes a
  *     new immutable `vNNNNNNNN` directory and then atomically repoints the
  *     `_current` pointer file (single POSIX rename). Every step is
  *     crash-recoverable: data directories are never mutated once the
  *     pointer names them, a half-written new version is invisible until
  *     the pointer moves, and the pointer move itself is atomic. This also
  *     yields time travel ([[readVersion]]) and snapshot expiry
  *     ([[expire]], automatic per commit with `retainVersions`) — the
  *     reference's Iceberg snapshot/maintenance surface
  *     (incremental_kafka_s3_cdc.py:405-423) re-expressed on plain parquet.
  *
  *   - '''Partitioned: hive-layout copy-on-write.''' Optionally
  *     hive-partitioned by a derived month column `__part_month` (the
  *     reference's hidden `MONTHS(created_col)` partition transform, chosen
  *     by the same heuristic: a timestamp column whose name contains
  *     "create" — SURVEY.md K6). Merge only rewrites the partitions the
  *     batch (or a moved stored row) touches — static partition pruning on
  *     a pushed-down filter plus `partitionOverwriteMode=dynamic`. This is
  *     the reference's `months(t.pc)=months(s.pc)` merge conjunct
  *     (incremental_kafka_s3_cdc.py:262-264) re-expressed Spark-natively.
  *     Untouched partitions are never read or written; the per-partition
  *     replace goes through Spark's staged committer.
  *
  * Plain parquet has no optimistic concurrency (SURVEY.md §7 risk e):
  * single-writer per table is assumed, as documented.
  */
final class CdcTable(
    spark: SparkSession,
    val path: String,
    val keys: Seq[String],
    val partitionSource: Option[String] = None,
    val retainVersions: Int = 3) {

  import CdcTable._

  // ---------------------------------------------------------------- layout

  private def versioned: Boolean = partitionSource.isEmpty
  private def pointer = new File(path, CurrentPointer)
  private def versionDir(v: Long) = new File(path, f"v$v%08d")

  /** Latest committed version (unpartitioned layout), if any. */
  def currentVersion: Option[Long] =
    if (!pointer.exists()) None
    else Some(Files.readString(pointer.toPath).trim.stripPrefix("v").toLong)

  /** All committed versions still on disk, oldest first. */
  def versions: Seq[Long] =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d{8}"))
      .map(_.getName.stripPrefix("v").toLong).sorted.toSeq

  private def exists: Boolean =
    if (versioned) pointer.exists()
    else {
      val f = new File(path)
      f.exists() && f.listFiles() != null && f.listFiles().nonEmpty
    }

  private def dataDir: String =
    if (versioned)
      currentVersion.map(versionDir(_).getPath)
        .getOrElse(throw new java.io.FileNotFoundException(s"no committed version at $path"))
    else path

  // ----------------------------------------------------------------- reads

  /** Current table content (user columns only). */
  def read: DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(dataDir)
    if (df.columns.contains(PartCol)) df.drop(PartCol) else df
  }

  /** Time travel (unpartitioned layout): read a specific retained version. */
  def readVersion(v: Long): DataFrame = {
    val d = versionDir(v)
    if (!d.exists())
      throw new java.io.FileNotFoundException(s"version $v of $path is expired or never existed")
    spark.read.option("mergeSchema", "true").parquet(d.getPath)
  }

  // --------------------------------------------------------------- commits

  /** Write `df` as the next version and atomically repoint `_current`:
    * write the new pointer beside the old one, then rename over it (POSIX
    * rename replaces atomically). A crash before the rename leaves the old
    * version live; after it, the new one. Old versions beyond
    * `retainVersions` are expired after the pointer moves.
    */
  private def commit(df: DataFrame): Unit = {
    val next = currentVersion.getOrElse(0L) + 1
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(next).getPath)
    val tmp = Paths.get(path, s"$CurrentPointer.tmp")
    Files.writeString(tmp, f"v$next%08d")
    Files.move(tmp, pointer.toPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    expire()
  }

  /** Drop pointer-unreachable version directories: history older than the
    * newest `retainVersions` plus any orphan newer than the pointer (a
    * commit that crashed between data write and pointer move). Never
    * touches the current version; safe to re-run at any time — expiry is
    * the only step that deletes, and only what the pointer cannot reach.
    */
  def expire(): Unit = currentVersion.foreach { cur =>
    val live = versions.filter(_ <= cur).takeRight(retainVersions).toSet
    versions.filterNot(v => live.contains(v) || v == cur)
      .foreach(v => rm(versionDir(v)))
  }

  /** Initialize (overwrite) the table with `df`. */
  def init(df: DataFrame): Unit = partitionSource match {
    case Some(_) =>
      withPart(df).write.mode(SaveMode.Overwrite).partitionBy(PartCol).parquet(path)
    case None => commit(df)
  }

  /** Keyless append (reference K3/K4): new part-files into the live
    * location (each parquet file lands atomically via Spark's staged
    * committer; no table rewrite, so no version bump).
    */
  def append(df: DataFrame): Unit = partitionSource match {
    case Some(_) =>
      withPart(df).write.mode(SaveMode.Append).partitionBy(PartCol).parquet(path)
    case None =>
      if (!exists) init(df)
      else df.write.mode(SaveMode.Append).parquet(dataDir)
  }

  private def withPart(df: DataFrame): DataFrame = partitionSource match {
    case Some(src) => df.withColumn(PartCol, date_format(col(src), "yyyy-MM"))
    case None      => df
  }

  // ----------------------------------------------------------------- merge

  /** MERGE a raw CDC batch: latest-wins dedup on (keys, tsCol), then
    * join-based upsert/delete, rewriting only touched partitions (or
    * committing one new version). Idempotent: re-applying the same batch
    * is a no-op.
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
        // Partition-pruned copy-on-write: months present in the batch are
        // read, merged, and dynamically overwritten.
        val batchMonths = deduped
          .select(date_format(col(src), "yyyy-MM").as(PartCol))
          .distinct().as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
        val all = spark.read.option("mergeSchema", "true").parquet(path)
        // Moved-key guard: a stored row whose key appears in the batch may
        // live in a different month (the partition-source column was
        // updated, or a delete arrived carrying a new/null month). Probe
        // the stored (keys, month) pairs — column pruning keeps this scan
        // to the key columns plus the hive partition value — with the
        // small batch-key set broadcast, and union those months into the
        // touched set so the old copy is read and rewritten too.
        val keyMonths = all
          .select((keys.map(col) :+ col(PartCol)): _*)
          .join(broadcast(deduped.select(keys.map(col): _*).distinct()), keys, "left_semi")
          .select(col(PartCol))
          .distinct().as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq
        val touched = (batchMonths ++ keyMonths).distinct.filter(_ != null)
        val existing = all.filter(col(PartCol).isin(touched: _*)).drop(PartCol)
        val merged = withPart(CdcMerge.merge(existing, deduped, keys)).cache()
        // Dynamic overwrite only replaces partitions present in the output:
        // a touched month whose rows all moved away must be dropped
        // explicitly after the write.
        val outMonths = merged.select(col(PartCol))
          .distinct().as[String](org.apache.spark.sql.Encoders.STRING).collect().toSet
        val prev = spark.conf.getOption(OverwriteModeKey)
        spark.conf.set(OverwriteModeKey, "dynamic")
        try {
          merged.write.mode(SaveMode.Overwrite).partitionBy(PartCol).parquet(path)
        } finally prev match {
          case Some(v) => spark.conf.set(OverwriteModeKey, v)
          case None    => spark.conf.unset(OverwriteModeKey)
        }
        merged.unpersist()
        touched.filterNot(outMonths.contains)
          .foreach(m => rm(new File(path, s"$PartCol=$m")))
      case None =>
        val merged = CdcMerge.merge(read, deduped, keys)
        // versioned commit: the new version materializes fully before the
        // pointer moves, so no read-our-input hazard and no crash window
        commit(merged)
    }
  }

  /** Compaction (reference K10): rewrite to `target` files per partition. */
  def compact(target: Int = 1): Unit = partitionSource match {
    case Some(_) =>
      val df = spark.read.option("mergeSchema", "true").parquet(path)
      val prev = spark.conf.getOption(OverwriteModeKey)
      spark.conf.set(OverwriteModeKey, "dynamic")
      try df.repartition(target, col(PartCol))
        .write.mode(SaveMode.Overwrite).partitionBy(PartCol).parquet(path)
      finally prev match {
        case Some(v) => spark.conf.set(OverwriteModeKey, v)
        case None    => spark.conf.unset(OverwriteModeKey)
      }
    case None => commit(read.repartition(target))
  }

  private def rm(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(): Unit
  }
}

object CdcTable {
  /** Derived hive partition column (month bucket of the source ts col). */
  val PartCol = "__part_month"

  /** Pointer file naming the live version (unpartitioned layout). */
  val CurrentPointer = "_current"

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
