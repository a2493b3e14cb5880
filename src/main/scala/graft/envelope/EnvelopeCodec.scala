package graft.envelope

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.types.TypeMaps

/** Synthesis and decoding of the Debezium CDC wire envelope.
  *
  * The wire shape is fixed by the reference's connector config
  * (mysql-connector.json: JSON converter with embedded value schemas,
  * headers `table,op,source.ts_ms,source.db` in that positional order) and
  * consumed at incremental_kafka_s3_cdc.py:214-215 (double `from_json`),
  * :378-381 (positional header extraction). Offline we synthesize the same
  * envelope rows from the `events` parquet table (FIXTURES.md §2) instead of
  * reading Kafka; the decode pipeline is wire-format-identical.
  */
object EnvelopeCodec {

  /** Outer envelope: `schema` and `payload` captured as raw JSON strings,
    * exactly like the reference's first from_json pass
    * (incremental_kafka_s3_cdc.py:214).
    */
  val outerSchema: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("payload", StringType)
  ))

  /** Embedded Kafka-Connect schema for the synthesized `events` payload.
    * `created_at` carries epoch millis with the Debezium Timestamp logical
    * type, as real MySQL DATETIME columns do on this wire.
    */
  val eventsSchemaJson: String =
    """{"type":"struct","fields":[
      |{"field":"event_id","type":"int64","optional":false},
      |{"field":"user_id","type":"int64","optional":true},
      |{"field":"event_type","type":"string","optional":true},
      |{"field":"value","type":"double","optional":true},
      |{"field":"props","type":"string","optional":true},
      |{"field":"created_at","type":"int64","optional":false,"name":"io.debezium.time.Timestamp"},
      |{"field":"__deleted","type":"string","optional":true}]}""".stripMargin.replace("\n", "")

  /** Map an events row to a CDC op code: signup=insert, error=delete,
    * everything else=update. Gives the fixture deletes and upserts
    * (reference ops c/u/d/r, incremental_kafka_s3_cdc.py:271-274).
    */
  def opFromEventType(c: Column): Column =
    when(c === "signup", "c").when(c === "error", "d").otherwise("u")

  /** Build envelope rows (key, value, headers, topic) from the `events`
    * table. Key = PK JSON; value = {schema, payload}; headers positional
    * binary values; topic encodes rds + tenant ids for regexp extraction
    * (incremental_kafka_s3_cdc.py:295-296).
    */
  def synthesize(events: DataFrame): DataFrame = {
    val payload = to_json(struct(
      col("event_id"),
      col("user_id"),
      col("event_type"),
      col("value"),
      col("props"),
      unix_millis(col("ts")).as("created_at"),
      when(opFromEventType(col("event_type")) === "d", "true").otherwise("false").as("__deleted")
    ))
    val header = (k: String, v: Column) =>
      struct(lit(k).as("key"), v.cast(BinaryType).as("value"))
    events.select(
      to_json(struct(col("event_id"))).as("key"),
      concat(
        lit("""{"schema":""" + eventsSchemaJson + ""","payload":"""),
        payload,
        lit("}")
      ).as("value"),
      array(
        header("table", lit("events")),
        header("op", opFromEventType(col("event_type"))),
        header("source.ts_ms", unix_millis(col("ts")).cast(StringType)),
        header("source.db", concat(lit("oms"), (col("user_id") % 2 + 1).cast(StringType)))
      ).as("headers"),
      concat(lit("source_glaucus1.oms"), (col("user_id") % 2 + 1).cast(StringType), lit(".events")).as("topic")
    )
  }

  /** [[synthesize]] generalized to ANY flat table: the embedded
    * Kafka-Connect schema derives from the frame's own Spark schema
    * (int64/int32/double/float/boolean/string; TimestampType rides the
    * io.debezium.time.Timestamp logical type as epoch millis), the
    * envelope keys by `pk`, routes by `table`, and takes the op code
    * (c/u/d) from `opCol` and the event time from `tsCol` (both dropped
    * from the payload). The multi-table streaming fixture face: fact and
    * dimension CDC flowing through ONE pipeline.
    */
  def synthesizeTable(df: DataFrame, table: String, pk: String,
                      opCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val dataCols = df.columns.filterNot(c => c == opCol || c == tsCol).toSeq
    def fieldJson(name: String): String = {
      val opt = name != pk
      df.schema(name).dataType match {
        case LongType    => s"""{"field":"$name","type":"int64","optional":$opt}"""
        case IntegerType => s"""{"field":"$name","type":"int32","optional":$opt}"""
        case DoubleType  => s"""{"field":"$name","type":"double","optional":$opt}"""
        case FloatType   => s"""{"field":"$name","type":"float","optional":$opt}"""
        case BooleanType => s"""{"field":"$name","type":"boolean","optional":$opt}"""
        case TimestampType =>
          s"""{"field":"$name","type":"int64","optional":$opt,"name":"io.debezium.time.Timestamp"}"""
        case _ => s"""{"field":"$name","type":"string","optional":$opt}"""
      }
    }
    val schemaJson =
      s"""{"type":"struct","fields":[${dataCols.map(fieldJson).mkString(",")},""" +
        """{"field":"__deleted","type":"string","optional":true}]}"""
    val payloadCols = dataCols.map { c =>
      df.schema(c).dataType match {
        case TimestampType => unix_millis(col(c)).as(c)
        case _             => col(c)
      }
    }
    val payload = to_json(struct(payloadCols :+
      when(col(opCol) === "d", "true").otherwise("false").as("__deleted"): _*))
    val header = (k: String, v: Column) =>
      struct(lit(k).as("key"), v.cast(BinaryType).as("value"))
    df.select(
      to_json(struct(col(pk))).as("key"),
      concat(lit("""{"schema":""" + schemaJson + ""","payload":"""), payload, lit("}")).as("value"),
      array(
        header("table", lit(table)),
        header("op", col(opCol)),
        header("source.ts_ms", unix_millis(col(tsCol)).cast(StringType)),
        header("source.db", lit("oms1"))
      ).as("headers"),
      lit(s"source_glaucus1.oms1.$table").as("topic"))
  }

  /** The OUTBOUND half of the codec: encode a change feed
    * ([[graft.ops.CdcTable.changesBetween]] / a [[graft.cdc.ChangeFeed]]
    * window) as Debezium-shaped envelopes — insert→c,
    * update_postimage→u, delete→d, preimages dropped (the wire format
    * carries post-state + op). Composed with the decode side this
    * REPLICATES a table to another cluster through the same envelope
    * bus the engine ingests: feed → encodeFeed → transport → pipeline →
    * replica, with the cursor's at-least-once redelivery collapsing to
    * exactly-once under the replica's idempotent latest-wins merge.
    * `tsMs` orders the windows on the wire (monotonic per window — the
    * feed's `toVersion` is the natural choice); within one window a
    * key appears at most once (the feed is a keyed diff), so any
    * tie-break is moot.
    */
  def encodeFeed(changes: DataFrame, table: String, pk: String,
                 tsMs: Column): DataFrame = {
    val ct = graft.ops.CdcTable.ChangeTypeCol
    val ops = changes.filter(col(ct) =!= "update_preimage")
      .withColumn("__op",
        when(col(ct) === "insert", "c")
          .when(col(ct) === "update_postimage", "u")
          .otherwise("d"))
      .withColumn("__feed_ts", timestamp_millis(tsMs))
      .drop(ct)
    synthesizeTable(ops, table, pk, "__op", "__feed_ts")
  }

  /** Positional header extraction + metadata casts, mirroring
    * incremental_kafka_s3_cdc.py:376-383: __table, __op, __ts_ms (epoch
    * millis -> timestamp), __db, plus key/value cast to string.
    */
  def withMeta(env: DataFrame): DataFrame = {
    def h(i: Int) = element_at(col("headers"), i).getField("value").cast(StringType)
    env.select(
      col("key").cast(StringType).as("key"),
      col("value").cast(StringType).as("value"),
      h(1).as("__table"),
      h(2).as("__op"),
      timestamp_millis(h(3).cast(LongType)).as("__ts_ms"),
      h(4).as("__db"),
      col("topic").as("__topic")
    )
  }

  /** Decode the payload of envelope rows against a known wire schema and
    * normalize Debezium logical types to their semantic Spark types.
    * Second from_json pass of incremental_kafka_s3_cdc.py:215 plus the
    * normalization at :222-238.
    */
  def decodePayload(env: DataFrame, fields: Seq[WireField], primaryKey: Option[String] = None): DataFrame = {
    val wire = DebeziumSchema.wireStruct(fields, primaryKey)
    val logical = DebeziumSchema.logicalNames(fields)
    val decoded = env
      .withColumn("__outer", from_json(col("value"), outerSchema))
      .withColumn("__payload", from_json(col("__outer").getField("payload"), wire))
      .select(col("__payload.*"), col("__op"), col("__db"), col("__ts_ms"), col("__topic"))
    logical.foldLeft(decoded) { case (d, (name, logicalName)) =>
      d.withColumn(name, TypeMaps.normalize(col(name), logicalName))
    }
  }

  /** The (key, value) of the batch's LATEST record: greatest `__ts_ms`,
    * ties broken by (key, value) string order — a total order, so the
    * sniffed record is deterministic regardless of partitioning. The
    * reference sniffs "the last record" (incremental_kafka_s3_cdc.py:317),
    * but "last" on an unordered DataFrame is partition-order-dependent;
    * max-by-event-time preserves the intent (when a schema evolves
    * mid-batch, the LATER schema wins) and is stable across replans.
    * One map-side-combinable aggregate, no sort.
    */
  def latestRecord(env: DataFrame): Option[(String, String)] = {
    require(env.columns.contains("__ts_ms"),
      "latestRecord needs withMeta-decorated envelopes (missing __ts_ms — apply EnvelopeCodec.withMeta first)")
    val r = env.agg(max_by(
      struct(col("key"), col("value")),
      struct(col("__ts_ms"), col("key"), col("value"))).as("r"))
      .head.getStruct(0)
    Option(r).map(s => (s.getString(0), s.getString(1)))
  }

  /** Two-pass dynamic decode, the reference's data-driven schema flow
    * (incremental_kafka_s3_cdc.py:317,326): sniff the PK from the latest
    * record's key JSON and the schema from its embedded `schema` field,
    * then re-plan the batch decode with that schema. The overload takes
    * an already-sniffed record so a caller that needs the sniff for its
    * own routing (CdcPipeline's PK dispatch) runs the aggregate job once
    * per table per batch, not twice.
    */
  def decodeDynamic(env: DataFrame): DataFrame =
    decodeDynamic(env, latestRecord(env).getOrElse(
      throw new IllegalArgumentException("empty envelope batch")))

  def decodeDynamic(env: DataFrame, latest: (String, String)): DataFrame = {
    val (keyJson, valueJson) = latest
    val pk = DebeziumSchema.primaryKeyFromKeyJson(keyJson)
    val outer = new com.fasterxml.jackson.databind.ObjectMapper().readTree(valueJson)
    val fields = DebeziumSchema.parseFields(outer.get("schema").toString)
    decodePayload(env, fields, pk)
  }

  /** Multi-tenant audit columns: tenant/rds ids regex-extracted from db and
    * topic names, null tenant -> 0 (incremental_kafka_s3_cdc.py:294-302),
    * plus load timestamp.
    */
  def withTenantColumns(df: DataFrame): DataFrame =
    df.withColumn("__tenant_id",
        coalesce(regexp_extract(col("__db"), "(\\d+)", 1).cast(LongType), lit(0L)))
      .withColumn("__rds_id",
        coalesce(regexp_extract(col("__topic"), "glaucus(\\d+)", 1).cast(LongType), lit(0L)))
}
