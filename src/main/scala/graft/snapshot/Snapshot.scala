package graft.snapshot

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.SchemaEvolution

/** One-shot history snapshot loader — the reference's `sanpshot_script.py`
  * (typo theirs; SURVEY.md §3.2) re-expressed Spark-natively:
  *
  *   - bounds probe (`SELECT min(pk), max(pk)`) sizing a 5-way
  *     range-partitioned parallel scan (sanpshot_script.py:87-143); offline
  *     the JDBC source is a parquet path and the parallel-scan semantics are
  *     kept with `repartitionByRange(numPartitions, pk)`
  *   - column sanitization + audit columns + append write
  *     (sanpshot_script.py:217-233)
  *   - an `insert_log` watermark table recording completed loads, consulted
  *     via anti-join on restart so finished tables are skipped
  *     (sanpshot_script.py:235,257-259)
  */
final class Snapshot(spark: SparkSession, logPath: String) {

  /** Bounds probe: the pushed-down min/max aggregate (A1). */
  def probeBounds(df: DataFrame, pk: String): Option[(Long, Long)] = {
    val r = df.agg(min(col(pk)).cast("long"), max(col(pk)).cast("long")).head()
    if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
  }

  /** Range-partitioned parallel scan: with a PK and non-empty bounds, read
    * range-partitioned `numPartitions` ways on the key (the reference's
    * JDBC `partitionColumn/lowerBound/upperBound/numPartitions=5`).
    * Keyless or empty keeps the source's own partitioning: the reference
    * falls back to a single JDBC connection there, but for a distributed
    * file source serializing the scan to one partition would make the
    * keyless path a 100 TB bottleneck — the parquet splits are already
    * parallel, so pass them through.
    */
  def parallelScan(df: DataFrame, pk: Option[String], numPartitions: Int = 5): DataFrame =
    pk match {
      case Some(k) if probeBounds(df, k).isDefined =>
        df.repartitionByRange(numPartitions, col(k))
      case _ => df
    }

  private def loadedTables: Set[String] =
    if (new java.io.File(logPath).exists())
      spark.read.parquet(logPath).select("table").distinct()
        .collect().map(_.getString(0)).toSet
    else Set.empty

  /** [[loadTable]] through the source-adapter seam
    * ([[graft.sources.SnapshotSource]]): a real JDBC reader (the
    * reference's 5-way partitioned MySQL scan, sanpshot_script.py:117-129)
    * drops in as another SnapshotSource implementation — this loader
    * never knows which backend produced the rows.
    */
  def load(src: graft.sources.SnapshotSource, table: String, sinkPath: String,
           pk: Option[String], tenantId: Long = 0L, rdsId: Long = 0L,
           writePartitions: Int = 8): Boolean =
    // watermark check BEFORE touching the source: a skipped table must
    // not pay the adapter's read setup (a JDBC impl opens a connection
    // and probes the remote schema in read())
    if (loadedTables.contains(table)) false
    else loadTable(src.read(spark), table, sinkPath, pk, tenantId, rdsId, writePartitions)

  /** Snapshot one source table into `sinkPath`, unless the watermark log
    * already records it. Returns true if a load happened.
    */
  def loadTable(source: DataFrame, table: String, sinkPath: String,
                pk: Option[String], tenantId: Long = 0L, rdsId: Long = 0L,
                writePartitions: Int = 8): Boolean = {
    if (loadedTables.contains(table)) return false
    val scanned = parallelScan(source, pk)
    val sane = SchemaEvolution.sanitizeColumns(scanned)
    val audited = graft.types.TypeMaps.coerceForWrite(sane)
      .withColumn("__op", lit("r"))
      .withColumn("__dp_update_ts", current_timestamp())
      .withColumn("__tenant_id", lit(tenantId))
      .withColumn("__rds_id", lit(rdsId))
    // the reference repartitions to a magic 500 before append
    // (sanpshot_script.py:233); we size explicitly and let AQE coalesce
    audited.repartition(writePartitions)
      .write.mode(SaveMode.Append).parquet(sinkPath)
    val log = {
      import spark.implicits._
      Seq((table, sinkPath)).toDF("table", "sink")
    }
    log.withColumn("loaded_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(logPath)
    true
  }
}
