package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.envelope.DebeziumSchema
import graft.types.TypeMaps

class DebeziumSchemaSpec extends SparkSpec {

  // the reference's 22-type wide matrix (FIXTURES.md §1) on the wire
  private val wideSchema =
    """{"type":"struct","fields":[
      |{"field":"invoice_id","type":"int64","optional":false},
      |{"field":"item_id","type":"int32","optional":true},
      |{"field":"smallint_col","type":"int16","optional":true},
      |{"field":"quantity","type":"int8","optional":true},
      |{"field":"category","type":"string","optional":true},
      |{"field":"price","type":"double","optional":true},
      |{"field":"price1","type":"float32","optional":true},
      |{"field":"order_date","type":"int64","optional":true,"name":"io.debezium.time.Timestamp"},
      |{"field":"current_dt","type":"int64","optional":true,"name":"io.debezium.time.MicroTimestamp"},
      |{"field":"zoned","type":"string","optional":true,"name":"io.debezium.time.ZonedTimestamp"},
      |{"field":"dob","type":"int32","optional":true,"name":"io.debezium.time.Date"},
      |{"field":"start_to_work","type":"int64","optional":true,"name":"io.debezium.time.MicroTime"},
      |{"field":"year_col","type":"int32","optional":true,"name":"io.debezium.time.Year"},
      |{"field":"geo","type":"string","optional":true,"name":"io.debezium.data.geometry.Geometry"},
      |{"field":"mystery","type":"some_unknown_type","optional":true}]}""".stripMargin.replace("\n", "")

  test("wide matrix parses with wire types, PK non-nullable, unknown->string") {
    val fields = DebeziumSchema.parseFields(wideSchema)
    val struct = DebeziumSchema.wireStruct(fields, primaryKey = Some("invoice_id"))
    val byName = struct.fields.map(f => f.name -> f).toMap
    assert(byName("invoice_id").dataType == LongType && !byName("invoice_id").nullable)
    assert(byName("item_id").dataType == IntegerType)
    assert(byName("smallint_col").dataType == ShortType)
    assert(byName("quantity").dataType == ByteType)
    assert(byName("price").dataType == DoubleType)
    assert(byName("price1").dataType == FloatType)
    // logical time types arrive as numerics on the wire
    assert(byName("order_date").dataType == LongType)
    assert(byName("current_dt").dataType == LongType)
    assert(byName("zoned").dataType == StringType)
    assert(byName("dob").dataType == LongType)
    assert(byName("year_col").dataType == IntegerType)
    assert(byName("geo").dataType == StringType)
    assert(byName("mystery").dataType == StringType)
  }

  test("ddl types map to semantic types for table creation") {
    val fields = DebeziumSchema.parseFields(wideSchema)
    val ddl = fields.map(f => f.name -> f.ddlType).toMap
    assert(ddl("order_date") == "timestamp")
    assert(ddl("dob") == "date")
    assert(ddl("year_col") == "integer")
    assert(ddl("invoice_id") == "long")
    assert(ddl("quantity") == "integer")
  }

  test("primary key extracted from Debezium key JSON") {
    assert(DebeziumSchema.primaryKeyFromKeyJson("""{"sale_id": 123}""").contains("sale_id"))
    assert(DebeziumSchema.primaryKeyFromKeyJson("""{}""").isEmpty)
  }

  test("schema sniff picks the max-__ts_ms record under any partitioning; later key schema wins") {
    import org.apache.spark.sql.functions.col
    val sql = spark
    import sql.implicits._
    // a batch whose key schema evolved mid-batch: early records keyed by
    // old_pk, the latest by new_pk — whichever partitioning the batch
    // arrives in, the sniff must land on the later schema (a positional
    // tail(1) would flip with partition order)
    val rows = (1 to 40).map { i =>
      val late = i == 17 // latest event buried mid-sequence, not last
      val key = if (late) """{"new_pk": 1}""" else s"""{"old_pk": $i}"""
      val ts = if (late) java.sql.Timestamp.valueOf("2024-06-01 00:00:09")
               else java.sql.Timestamp.valueOf(s"2024-06-01 00:00:0${i % 9}")
      (key, s"""{"schema":{},"payload":"$i"}""", ts)
    }
    Seq(1, 3, 7).foreach { parts =>
      val env = rows.toDF("key", "value", "__ts_ms").repartition(parts, col("key"))
      val latest = graft.envelope.EnvelopeCodec.latestRecord(env)
      assert(latest.map(_._1).contains("""{"new_pk": 1}"""),
        s"partitioning with $parts partitions must not change the sniffed record")
      assert(latest.flatMap(r => DebeziumSchema.primaryKeyFromKeyJson(r._1)).contains("new_pk"))
    }
    assert(graft.envelope.EnvelopeCodec.latestRecord(
      Seq.empty[(String, String, java.sql.Timestamp)].toDF("key", "value", "__ts_ms")).isEmpty)
  }

  test("mysql->ddl map covers the reference's full type surface") {
    val m = TypeMaps.mysqlToDdl
    assert(m("bigint") == "long" && m("tinyint") == "integer" &&
      m("decimal") == "decimal(38,2)" && m("datetime") == "timestamp" &&
      m("time") == "long" && m("year") == "integer" &&
      m("json") == "string" && m("multipolygon") == "string" &&
      m("longblob") == "string" && m("enum") == "string")
  }

  private val identGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))
  private val primGen = Gen.oneOf("int8", "int16", "int32", "int64",
    "float32", "float64", "boolean", "string", "bytes")

  test("property: optional flag round-trips to nullability, non-PK") {
    val gen = Gen.nonEmptyListOf(Gen.zip(identGen, primGen, Gen.oneOf(true, false)))
    val prop = Prop.forAll(gen) { specs =>
      val distinct = specs.distinctBy(_._1)
      val json = distinct.map { case (n, t, opt) =>
        s"""{"field":"$n","type":"$t","optional":$opt}"""
      }.mkString("""{"type":"struct","fields":[""", ",", "]}")
      val struct = DebeziumSchema.parse(json)
      struct.fields.length == distinct.length &&
        struct.fields.zip(distinct).forall { case (f, (n, _, opt)) =>
          f.name == n && f.nullable == opt
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }
}
