package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's type-mapping layer.
  *
  * Re-expresses the three mapping tables of the reference
  * (incremental_kafka_s3_cdc.py:44-82 MySQL->DDL,
  * incremental_kafka_s3_cdc.py:151-170 Debezium wire->Spark,
  * incremental_kafka_s3_cdc.py:171-193 Debezium wire->DDL) as typed Scala
  * maps, plus the post-decode logical-type normalization
  * (incremental_kafka_s3_cdc.py:222-238) as Column transforms.
  */
object TypeMaps {

  /** MySQL information_schema DATA_TYPE -> engine DDL type.
    * Mirrors incremental_kafka_s3_cdc.py:44-82 (superset of
    * sanpshot_script.py:36-51). Geometry/blob/enum/set/json collapse to
    * string; boolean-ish integers widen to integer.
    */
  val mysqlToDdl: Map[String, String] = Map(
    "bigint"     -> "long",
    "int"        -> "integer",
    "integer"    -> "integer",
    "mediumint"  -> "integer",
    "smallint"   -> "integer",
    "tinyint"    -> "integer",
    "boolean"    -> "integer",
    "bool"       -> "integer",
    "decimal"    -> "decimal(38,2)",
    "numeric"    -> "decimal(38,2)",
    "float"      -> "float",
    "double"     -> "double",
    "real"       -> "double",
    "bit"        -> "long",
    "datetime"   -> "timestamp",
    "timestamp"  -> "timestamp",
    "date"       -> "date",
    "time"       -> "long",
    "year"       -> "integer",
    "char"       -> "string",
    "varchar"    -> "string",
    "tinytext"   -> "string",
    "text"       -> "string",
    "mediumtext" -> "string",
    "longtext"   -> "string",
    "enum"       -> "string",
    "set"        -> "string",
    "json"       -> "string",
    "binary"     -> "string",
    "varbinary"  -> "string",
    "tinyblob"   -> "string",
    "blob"       -> "string",
    "mediumblob" -> "string",
    "longblob"   -> "string",
    "geometry"           -> "string",
    "point"              -> "string",
    "linestring"         -> "string",
    "polygon"            -> "string",
    "multipoint"         -> "string",
    "multilinestring"    -> "string",
    "multipolygon"       -> "string",
    "geometrycollection" -> "string"
  )

  /** Debezium/Kafka-Connect logical type names (the `name` attribute on a
    * schema field). Values arrive on the wire as ints/strings and are
    * normalized post-decode (see [[normalize]]).
    */
  object Logical {
    val Date           = "io.debezium.time.Date"            // int32: epoch days
    val Timestamp      = "io.debezium.time.Timestamp"       // int64: epoch millis
    val MicroTimestamp = "io.debezium.time.MicroTimestamp"  // int64: epoch micros
    val MicroTime      = "io.debezium.time.MicroTime"       // int64: micros of day
    val ZonedTimestamp = "io.debezium.time.ZonedTimestamp"  // string: ISO-8601
    val Year           = "io.debezium.time.Year"            // int32
    val ConnectDecimal = "org.apache.kafka.connect.data.Decimal" // base64 bytes
    val Geometry       = "io.debezium.data.geometry.Geometry"
  }

  /** Debezium wire primitive -> Spark type *as it appears on the wire*
    * (what `from_json` must use). Mirrors incremental_kafka_s3_cdc.py:151-170:
    * logical time types arrive as int64/int32 and are decoded as longs, then
    * normalized. Unknown types fall back to string
    * (incremental_kafka_s3_cdc.py:201-205).
    */
  def wireType(primitive: String, logicalName: Option[String]): DataType =
    logicalName match {
      case Some(Logical.Date)           => LongType
      case Some(Logical.Timestamp)      => LongType
      case Some(Logical.MicroTimestamp) => LongType
      case Some(Logical.MicroTime)      => LongType
      case Some(Logical.ZonedTimestamp) => StringType
      case Some(Logical.Year)           => IntegerType
      case Some(Logical.ConnectDecimal) => StringType
      case Some(n) if n.startsWith("io.debezium.data.geometry") => StringType
      case _ =>
        primitive match {
          case "int8"            => ByteType
          case "int16"           => ShortType
          case "int32"           => IntegerType
          case "int64"           => LongType
          case "float32"         => FloatType
          case "float64"         => DoubleType
          case "double"          => DoubleType
          case "boolean"         => BooleanType
          case "string"          => StringType
          case "bytes"           => StringType
          case _                 => StringType
        }
    }

  /** Debezium wire type -> engine DDL type for CREATE TABLE: the *semantic*
    * type after normalization. Mirrors incremental_kafka_s3_cdc.py:171-193.
    */
  def wireToDdl(primitive: String, logicalName: Option[String]): String =
    logicalName match {
      case Some(Logical.Date)           => "date"
      case Some(Logical.Timestamp)      => "timestamp"
      case Some(Logical.MicroTimestamp) => "timestamp"
      case Some(Logical.MicroTime)      => "long"
      case Some(Logical.ZonedTimestamp) => "timestamp"
      case Some(Logical.Year)           => "integer"
      case Some(Logical.ConnectDecimal) => "decimal(38,2)"
      case Some(n) if n.startsWith("io.debezium.data.geometry") => "string"
      case _ =>
        primitive match {
          case "int8" | "int16" | "int32" => "integer"
          case "int64"                    => "long"
          case "float32"                  => "float"
          case "float64" | "double"       => "double"
          case "boolean"                  => "integer" // reference casts bool->int
          case _                          => "string"
        }
    }

  /** Post-decode normalization of one column carrying a Debezium logical
    * type. Re-expresses incremental_kafka_s3_cdc.py:222-238 with
    * millisecond/microsecond precision preserved (the reference routed
    * through from_unixtime and truncated to whole seconds — a lossy detail
    * we deliberately do not replicate; SURVEY.md §4 "bugs").
    */
  def normalize(c: Column, logicalName: String): Column = logicalName match {
    case Logical.Date           => date_add(to_date(lit("1970-01-01")), c.cast(IntegerType))
    case Logical.Timestamp      => timestamp_millis(c.cast(LongType))
    case Logical.MicroTimestamp => timestamp_micros(c.cast(LongType))
    case Logical.MicroTime      => c.cast(LongType) // micros-of-day stays numeric
    case Logical.ZonedTimestamp => to_timestamp(c)
    case Logical.Year           => c.cast(IntegerType)
    case Logical.ConnectDecimal => c.cast(DecimalType(38, 2))
    case _                      => c
  }

  /** Pre-write coercion applied by the reference: booleans and short ints
    * are widened to int (incremental_kafka_s3_cdc.py:336-339,
    * sanpshot_script.py:225-227).
    */
  def coerceForWrite(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case BooleanType | ByteType | ShortType =>
          d.withColumn(f.name, col(f.name).cast(IntegerType))
        case _ => d
      }
    }
}
