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

/** The PRODUCTION Kafka binding, compiled: the exact reader-option
  * surface of the reference's `read_from_kafka`
  * (incremental_kafka_s3_cdc.py:360-371), as code instead of a comment.
  * In this sandbox the spark-sql-kafka connector jar is absent, so
  * `readStream` fails at `.load()` with "Failed to find data source:
  * kafka" — the option TRANSLATION is spec-asserted offline
  * (`SourceBindingsSpec`), and on a cluster with the connector on the
  * classpath this class is the drop-in [[EnvelopeSource]].
  */
final class KafkaEnvelopeSource(
    bootstrapServers: Seq[String],
    subscribePattern: String,
    startingOffsets: String = "earliest",
    includeHeaders: Boolean = true,
    failOnDataLoss: Boolean = false,
    /** Broker-side long-poll bound; the reference pins 100 s. */
    fetchMaxWaitMs: Long = 100000L,
    /** Per-micro-batch ingestion cap — the Kafka-native analog of
      * [[FileEnvelopeSource]]'s `maxFilesPerTrigger` backlog bound. The
      * reference leaves it unset; at a 100 TB backfill it is the knob
      * that keeps a catch-up batch shuffle-sized.
      */
    maxOffsetsPerTrigger: Option[Long] = None) extends EnvelopeSource {

  /** The reference's reader options, verbatim (it anchors the topic
    * regex with a trailing `$` itself).
    */
  def options: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers.mkString(","),
    "includeHeaders" -> includeHeaders.toString,
    "subscribePattern" -> s"$subscribePattern$$",
    "startingOffsets" -> startingOffsets,
    "kafka.fetch.max.wait.ms" -> fetchMaxWaitMs.toString,
    "failOnDataLoss" -> failOnDataLoss.toString
  ) ++ maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  def readStream(spark: SparkSession): DataFrame = {
    val raw = options
      .foldLeft(spark.readStream.format("kafka")) { case (r, (k, v)) => r.option(k, v) }
      .load()
    // Kafka's wire key/value are BINARY; the engine's envelope shape is
    // the post-cast form (incremental_kafka_s3_cdc.py:376-377)
    raw.selectExpr(
      "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
      "headers", "topic")
  }
}

/** The PRODUCTION JDBC binding, compiled: the reference's three read
  * shapes (sanpshot_script.py) as one [[SnapshotSource]] —
  *
  *  - [[JdbcSnapshotSource.table]]: whole-table read, `dbtable` +
  *    `fetchsize` (sanpshot_script.py:104-113 / 131-143);
  *  - [[JdbcSnapshotSource.ranged]]: 5-way parallel range scan,
  *    `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`
  *    (sanpshot_script.py:115-129 — the bounds themselves come from the
  *    min/max probe, `Snapshot.parallelScan` carries that semantics);
  *  - [[JdbcSnapshotSource.query]]: full query PUSHDOWN to the database
  *    (`option("query", …)`) — the min/max bounds probe
  *    (sanpshot_script.py:91-99) and the `information_schema` metadata
  *    reads (sanpshot_script.py:68-85, 145-161) execute ON MySQL, only
  *    the (tiny) result crosses the wire.
  *
  * Offline there is no MySQL driver jar or endpoint: `read` fails at
  * `.load()` (driver class not found); the option translation is
  * spec-asserted, and on a cluster this class is the drop-in binding.
  */
final class JdbcSnapshotSource private (
    url: String,
    user: String,
    password: String,
    shape: Map[String, String],
    driver: String) extends SnapshotSource {

  def options: Map[String, String] = Map(
    "driver" -> driver,
    "url" -> url,
    "user" -> user,
    "password" -> password) ++ shape

  def read(spark: SparkSession): DataFrame =
    options.foldLeft(spark.read.format("jdbc")) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
}

object JdbcSnapshotSource {
  private val MysqlDriver = "com.mysql.cj.jdbc.Driver"

  /** Whole-table read (no usable key): sanpshot_script.py:104-113. */
  def table(url: String, user: String, password: String, tableName: String,
            fetchsize: Int = 10000, driver: String = MysqlDriver): JdbcSnapshotSource =
    new JdbcSnapshotSource(url, user, password,
      Map("dbtable" -> tableName, "fetchsize" -> fetchsize.toString), driver)

  /** Key-ranged parallel scan: sanpshot_script.py:115-129. `lower`/
    * `upper` are the min/max-probe results (strings, as Spark's JDBC
    * options are untyped on the wire).
    */
  def ranged(url: String, user: String, password: String, tableName: String,
             partitionColumn: String, lower: String, upper: String,
             numPartitions: Int = 5, fetchsize: Int = 10000,
             driver: String = MysqlDriver): JdbcSnapshotSource =
    new JdbcSnapshotSource(url, user, password,
      Map("dbtable" -> tableName, "fetchsize" -> fetchsize.toString,
        "numPartitions" -> numPartitions.toString,
        "partitionColumn" -> partitionColumn,
        "lowerBound" -> lower, "upperBound" -> upper), driver)

  /** Query pushdown (bounds probe, information_schema):
    * sanpshot_script.py:68-85, 91-99, 145-161.
    */
  def query(url: String, user: String, password: String, sql: String,
            fetchsize: Int = 50, numPartitions: Option[Int] = None,
            driver: String = MysqlDriver): JdbcSnapshotSource =
    new JdbcSnapshotSource(url, user, password,
      Map("query" -> sql, "fetchsize" -> fetchsize.toString) ++
        numPartitions.map("numPartitions" -> _.toString), driver)
}
