package graft.envelope

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import graft.types.TypeMaps

import scala.jdk.CollectionConverters._

/** One field of a Kafka-Connect embedded schema. */
final case class WireField(
    name: String,
    primitive: String,
    optional: Boolean,
    logicalName: Option[String]) {
  def wireType: DataType = TypeMaps.wireType(primitive, logicalName)
  def ddlType: String    = TypeMaps.wireToDdl(primitive, logicalName)
}

/** Parser for the Debezium/Kafka-Connect embedded JSON schema
  * (`value.schema` when `value.converter.schemas.enable=true`,
  * mysql-connector.json:29 in the reference).
  *
  * Re-expresses the dynamic StructType construction of
  * incremental_kafka_s3_cdc.py:150-213 as a pure function: the engine takes
  * the schema JSON of the *last* record of a micro-batch and derives (a) the
  * wire StructType used by `from_json` and (b) the semantic DDL types for
  * table creation.
  */
object DebeziumSchema {
  private val mapper = new ObjectMapper()

  /** Parse `{"type":"struct","fields":[{"field":...,"type":...,
    * "optional":...,"name":...}]}` into typed fields. Unknown primitive
    * types fall back to string (incremental_kafka_s3_cdc.py:201-205).
    */
  def parseFields(schemaJson: String): Seq[WireField] = {
    val root = mapper.readTree(schemaJson)
    val fieldsNode =
      if (root.has("fields")) root.get("fields")
      else mapper.createArrayNode()
    fieldsNode.elements().asScala.map { f =>
      WireField(
        name = f.get("field").asText(),
        primitive = if (f.has("type")) f.get("type").asText() else "string",
        optional = !f.has("optional") || f.get("optional").asBoolean(true),
        logicalName = Option(f.get("name")).map(_.asText()).filter(_.nonEmpty)
      )
    }.toSeq
  }

  /** Wire StructType for `from_json` over the payload. `primaryKey`, when
    * present, is stamped non-nullable (incremental_kafka_s3_cdc.py:206-207).
    */
  def wireStruct(fields: Seq[WireField], primaryKey: Option[String] = None): StructType =
    StructType(fields.map { f =>
      StructField(f.name, f.wireType, nullable = f.optional && !primaryKey.contains(f.name))
    })

  /** Full parse: schema JSON string -> wire StructType. */
  def parse(schemaJson: String, primaryKey: Option[String] = None): StructType =
    wireStruct(parseFields(schemaJson), primaryKey)

  /** Map field name -> Debezium logical type name, for post-decode
    * normalization (TypeMaps.normalize).
    */
  def logicalNames(fields: Seq[WireField]): Map[String, String] =
    fields.flatMap(f => f.logicalName.map(f.name -> _)).toMap

  /** Extract the primary-key column name from a Debezium Kafka key JSON
    * like `{"sale_id": 123}` (reference: json.loads(key).keys()[0],
    * incremental_kafka_s3_cdc.py:317).
    */
  def primaryKeyFromKeyJson(keyJson: String): Option[String] = {
    val node = mapper.readTree(keyJson)
    node.fieldNames().asScala.toSeq.headOption
  }
}
