package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.envelope.EnvelopeCodec
import graft.ops.CdcTable

/** The streaming CDC engine: Structured Streaming over an envelope source,
  * `foreachBatch` into per-table merges, exactly-once via checkpointing +
  * idempotent latest-wins merge. Re-expresses the reference's flagship path
  * (incremental_kafka_s3_cdc.py:360-403, SURVEY.md §3.1) with the Kafka
  * source swapped for a file source carrying the same envelope rows
  * (key, value, headers, topic) — the wire format is identical, so the
  * decode pipeline is shared with the batch path.
  *
  * Trigger semantics: `Trigger.AvailableNow` — the 4.x successor of the
  * reference's `trigger(once=True)` incremental run-to-completion. Restart
  * resumes from the checkpoint: already-processed files are never
  * reprocessed, and the idempotent merge makes replays safe anyway.
  */
final class CdcPipeline(
    spark: SparkSession,
    /** Where envelopes come from — the source-adapter seam
      * ([[graft.sources.EnvelopeSource]]): the offline file source and a
      * real Kafka reader are interchangeable here, the pipeline code
      * never knows which.
      */
    source: graft.sources.EnvelopeSource,
    checkpointDir: String,
    tableRoot: String,
    /** Materialized views to maintain inside the ingestion flow: after a
      * table's micro-batch merge commits, its registered views refresh
      * from the table's change data feed (merge -> CDF -> signed-delta
      * refresh, no re-scan) — see [[graft.ops.MaterializedView]].
      */
    views: Seq[CdcPipeline.ViewSpec] = Nil) {

  /** File-backed convenience constructors (the offline default). */
  def this(spark: SparkSession, envelopeDir: String, checkpointDir: String,
           tableRoot: String, views: Seq[CdcPipeline.ViewSpec]) =
    this(spark, new graft.sources.FileEnvelopeSource(envelopeDir), checkpointDir,
      tableRoot, views)
  def this(spark: SparkSession, envelopeDir: String, checkpointDir: String,
           tableRoot: String) =
    this(spark, envelopeDir, checkpointDir, tableRoot, Nil)

  @volatile private var batchesSeen: Long = 0L
  def batchCount: Long = batchesSeen

  /** Process one micro-batch: null-drop, split by __table, dynamic decode
    * per table, merge into that table's CdcTable. Mirrors df_to_sink +
    * process_for_table (incremental_kafka_s3_cdc.py:311-357,390-398) as
    * declarative plans — no RDD round-trips, no pandas detour.
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    batchesSeen += 1
    val withMeta = EnvelopeCodec.withMeta(batch)
      .na.drop(Seq("__op", "value", "__table", "__db"))
      .cache()
    try {
      val tables = withMeta.select("__table").distinct()
        .collect().map(_.getString(0))
      tables.foreach { t =>
        val env = withMeta.filter(col("__table") === t)
        // one sniff per table per batch: the max-__ts_ms record (not a
        // positional tail — deterministic under any partitioning, later
        // key schema wins) drives BOTH the schema decode and PK routing
        val latest = EnvelopeCodec.latestRecord(env).getOrElse(
          throw new IllegalArgumentException(s"empty envelope batch for table $t"))
        val decoded = EnvelopeCodec.withTenantColumns(EnvelopeCodec.decodeDynamic(env, latest))
        val keyName = graft.envelope.DebeziumSchema.primaryKeyFromKeyJson(latest._1)
        keyName match {
          case Some(pk) =>
            val table = new CdcTable(spark, s"$tableRoot/$t", Seq(pk))
            val payload = decoded
              .drop("__deleted", "__db", "__topic")
            // Tie-break on every non-key payload column: within a key group
            // the dedup key is constant, so it can never break a tie — order
            // by the remaining columns gives a deterministic winner even for
            // two ops sharing __ts_ms (SURVEY §7 risk d). The file-envelope
            // source carries no per-record sequence (no Kafka offset), so a
            // same-millisecond update/delete pair resolves update-wins
            // ('u' > 'd' in the __op tie column) — deterministic, and the
            // documented semantics until a monotonic offset column exists
            // to rank the physically-later op first.
            val tieCols = payload.columns.toSeq
              .filterNot(c => c == pk || c == "__ts_ms")
            table.merge(payload, "__ts_ms", tieCols)
            maintainViews(t, table)
          case None =>
            // keyless tables degrade to append (reference K3)
            val table = new CdcTable(spark, s"$tableRoot/$t", Nil)
            table.append(decoded.drop("__deleted", "__db", "__topic", "__op"))
            maintainViews(t, table)
        }
      }
    } finally {
      withMeta.unpersist(): Unit
    }
  }

  private def maintainViews(tableName: String, table: CdcTable): Unit =
    views.filter(_.table == tableName).foreach { vs =>
      new graft.ops.MaterializedView(spark, table, vs.viewPath, vs.groupCols, vs.sumCols, vs.extCols)
        .refresh()
    }

  /** Run one incremental pass over all currently-available envelope files,
    * then stop (trigger-once semantics). Safe to call repeatedly; each call
    * picks up only files the checkpoint has not seen.
    */
  def runOnce(): Unit = {
    val stream = source.readStream(spark)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

object CdcPipeline {
  /** Declarative view registration for the pipeline: maintain at
    * `viewPath` the per-`groupCols` count/sum/avg aggregate of ingested
    * table `table` (sums and avgs over `sumCols`, min/max over
    * `extCols`).
    */
  final case class ViewSpec(table: String, viewPath: String,
                            groupCols: Seq[String], sumCols: Seq[String],
                            extCols: Seq[String] = Nil)
}
