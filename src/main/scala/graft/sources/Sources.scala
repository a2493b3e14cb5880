package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The engine's source-adapter seam: the CDC pipeline consumes an
  * [[EnvelopeSource]] and the history loader a [[SnapshotSource]], so a
  * production reader drops in WITHOUT editing `CdcPipeline` or
  * `Snapshot`. The file-backed implementations below carry the offline
  * semantics; the reference's real adapters map onto the same traits:
  *
  *  - Kafka (incremental_kafka_s3_cdc.py:360-371):
  *    {{{
  *    spark.readStream.format("kafka")
  *      .option("kafka.bootstrap.servers", brokers)
  *      .option("subscribePattern", topicPattern)
  *      .option("startingOffsets", "earliest")
  *      .load()  // key, value, headers, topic — the envelope shape
  *    }}}
  *    (needs the spark-sql-kafka connector jar, absent in this sandbox)
  *
  *  - JDBC (sanpshot_script.py:117-129):
  *    {{{
  *    spark.read.format("jdbc")
  *      .option("url", url).option("dbtable", table)
  *      .option("partitionColumn", pk)
  *      .option("lowerBound", lo).option("upperBound", hi)
  *      .option("numPartitions", 5)
  *      .load()
  *    }}}
  *    (needs a JDBC driver jar; the bounds probe and 5-way range scan
  *    the reference pushes to MySQL live in `Snapshot.parallelScan`)
  */
trait EnvelopeSource {
  /** The unbounded envelope stream: rows shaped
    * (key STRING, value STRING, headers ARRAY<STRUCT<key,value>>,
    * topic STRING) — the Kafka wire shape after the reference's casts.
    */
  def readStream(spark: SparkSession): DataFrame
}

/** A bounded table read for the one-shot history snapshot. */
trait SnapshotSource {
  def read(spark: SparkSession): DataFrame
}

object EnvelopeSource {
  /** Envelope wire schema (incremental_kafka_s3_cdc.py:376-383). */
  val schema: StructType = StructType.fromDDL(
    "key STRING, value STRING, " +
      "headers ARRAY<STRUCT<key: STRING, value: BINARY>>, topic STRING")
}

/** Offline stand-in for the Kafka source: parquet files carrying the
  * same envelope rows, consumed incrementally through the file stream
  * (checkpoint tracks seen files, the trigger-once analog of committed
  * Kafka offsets).
  */
final class FileEnvelopeSource(
    dir: String,
    /** Ingestion rate limit: at most this many envelope files enter one
      * micro-batch (the file-source face of Kafka's
      * `maxOffsetsPerTrigger`). Bounds per-batch memory/shuffle at a
      * backlogged restart — without it, a pipeline catching up after
      * downtime processes the WHOLE backlog as one giant batch. With
      * `Trigger.AvailableNow` the stream still drains everything, just
      * in rate-bounded batches. None = unbounded (the default;
      * small-batch tests stay single-batch).
      */
    maxFilesPerTrigger: Option[Int] = None) extends EnvelopeSource {
  def readStream(spark: SparkSession): DataFrame = {
    val r = spark.readStream.schema(EnvelopeSource.schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
      .parquet(dir)
  }
}

/** Offline stand-in for the JDBC table read: a parquet path. */
final class ParquetSnapshotSource(path: String) extends SnapshotSource {
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}
