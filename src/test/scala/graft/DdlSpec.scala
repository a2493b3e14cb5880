package graft

import graft.envelope.DebeziumSchema
import graft.ops.{CdcTable, SchemaEvolution}

/** DDL / catalog surface (SURVEY §2 S4, K6-K9): CREATE TABLE with
  * codegen'd column list from wire fields, ALTER TABLE ADD COLUMN
  * evolution, DESCRIBE/metadata scans, REFRESH — all against the builtin
  * session catalog, the engine's stand-in for the Iceberg catalog.
  */
class DdlSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson =
    """{"type":"struct","fields":[
      |{"field":"sale_id","type":"int64","optional":false},
      |{"field":"item_id","type":"int32","optional":true},
      |{"field":"price","type":"double","optional":true},
      |{"field":"created_at","type":"int64","optional":false,"name":"io.debezium.time.Timestamp"}]}"""
      .stripMargin.replace("\n", "")

  test("CREATE TABLE from wire fields, ALTER ADD COLUMN, DESCRIBE, REFRESH") {
    val fields = DebeziumSchema.parseFields(schemaJson)
    val cols = fields.map(f => s"${SchemaEvolution.sanitizeName(f.name)} ${f.ddlType}")
    // K8: per-tenant namespace
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tenant_1")
    assert(spark.catalog.databaseExists("graft_tenant_1"))
    spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    // K6: codegen'd CREATE TABLE from the inferred schema
    spark.sql(s"CREATE TABLE graft_ddl_t (${cols.mkString(", ")}) USING parquet")

    // S4: catalog metadata scan via the typed API (not DESCRIBE string
    // parsing — SURVEY §2 S4's Spark-native mapping)
    val listed = spark.catalog.listColumns("graft_ddl_t").collect()
    assert(listed.map(_.name).toSeq == Seq("sale_id", "item_id", "price", "created_at"))
    assert(listed.find(_.name == "created_at").get.dataType == "timestamp")

    spark.sql("INSERT INTO graft_ddl_t VALUES (1, 2, 9.5, timestamp'2024-01-01 00:00:00')")

    // K7: additive evolution — diff batch schema vs sink, ALTER ADD
    val batch = Seq((2L, "x@y")).toDF("sale_id", "email")
    val newCols = SchemaEvolution.newColumns(
      spark.table("graft_ddl_t").schema, batch.schema)
    assert(newCols.map(_.name) == Seq("email"))
    newCols.foreach(f =>
      spark.sql(s"ALTER TABLE graft_ddl_t ADD COLUMN (${f.name} ${f.dataType.simpleString})"))

    // K9: refresh before re-read
    spark.catalog.refreshTable("graft_ddl_t")
    assert(spark.table("graft_ddl_t").columns.toSeq ==
      Seq("sale_id", "item_id", "price", "created_at", "email"))
    // old rows read null for the evolved column
    assert(spark.table("graft_ddl_t").select("email").head().isNullAt(0))
    spark.sql("DROP TABLE graft_ddl_t")
  }

  test("partition-source heuristic picks a created timestamp column (K6)") {
    val fields = DebeziumSchema.parseFields(schemaJson)
    val wire = DebeziumSchema.wireStruct(fields, Some("sale_id"))
    // on the wire created_at is a long; after normalization it's timestamp
    val normalized = org.apache.spark.sql.types.StructType(wire.fields.map { f =>
      if (f.name == "created_at") f.copy(dataType = org.apache.spark.sql.types.TimestampType) else f
    })
    assert(CdcTable.choosePartitionSource(normalized).contains("created_at"))
    assert(CdcTable.choosePartitionSource(wire).isEmpty) // still long: not eligible
  }
}
