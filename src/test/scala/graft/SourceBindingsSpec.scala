package graft

import graft.sources.{JdbcSnapshotSource, KafkaEnvelopeSource}

/** The compiled production connector bindings: the option surfaces must
  * equal the reference's reader calls VERBATIM
  * (incremental_kafka_s3_cdc.py:360-371, sanpshot_script.py:68-161), and
  * both bindings must fail at `.load()` in this offline sandbox (no
  * spark-sql-kafka connector jar, no MySQL driver jar) — proving the
  * classes are real code paths, not dead comments.
  */
class SourceBindingsSpec extends SparkSpec {

  test("Kafka binding emits the reference's exact reader options") {
    val src = new KafkaEnvelopeSource(
      bootstrapServers = Seq("b-1.msk:9092", "b-2.msk:9092"),
      subscribePattern = "source_glaucus1.oms.\\w+")
    assert(src.options === Map(
      "kafka.bootstrap.servers" -> "b-1.msk:9092,b-2.msk:9092",
      "includeHeaders" -> "true",
      // the reference anchors the pattern itself (f'{pattern}$')
      "subscribePattern" -> "source_glaucus1.oms.\\w+$",
      "startingOffsets" -> "earliest",
      "kafka.fetch.max.wait.ms" -> "100000",
      "failOnDataLoss" -> "false"))
  }

  test("Kafka binding exposes the backlog rate-limit knob") {
    val src = new KafkaEnvelopeSource(Seq("b:9092"), "t",
      maxOffsetsPerTrigger = Some(5000000L))
    assert(src.options("maxOffsetsPerTrigger") === "5000000")
  }

  test("Kafka binding fails offline at load() for the missing connector") {
    val e = intercept[Exception] {
      new KafkaEnvelopeSource(Seq("b:9092"), "t").readStream(spark)
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }

  test("JDBC whole-table shape matches sanpshot_script.py:104-113") {
    val src = JdbcSnapshotSource.table(
      "jdbc:mysql://db:3306/oms", "u", "p", "oms.invoices")
    assert(src.options === Map(
      "driver" -> "com.mysql.cj.jdbc.Driver",
      "url" -> "jdbc:mysql://db:3306/oms",
      "user" -> "u", "password" -> "p",
      "dbtable" -> "oms.invoices", "fetchsize" -> "10000"))
  }

  test("JDBC ranged shape matches sanpshot_script.py:115-129") {
    val src = JdbcSnapshotSource.ranged(
      "jdbc:mysql://db:3306/oms", "u", "p", "oms.invoices",
      partitionColumn = "invoice_id", lower = "1", upper = "999983")
    assert(src.options === Map(
      "driver" -> "com.mysql.cj.jdbc.Driver",
      "url" -> "jdbc:mysql://db:3306/oms",
      "user" -> "u", "password" -> "p",
      "dbtable" -> "oms.invoices", "fetchsize" -> "10000",
      "numPartitions" -> "5", "partitionColumn" -> "invoice_id",
      "lowerBound" -> "1", "upperBound" -> "999983"))
  }

  test("JDBC query-pushdown shape matches sanpshot_script.py:68-85,91-99,145-161") {
    val pk = JdbcSnapshotSource.query("jdbc:mysql://db:3306/oms", "u", "p",
      "select COLUMN_NAME from information_schema.columns where COLUMN_KEY='PRI'")
    assert(pk.options("query").startsWith("select COLUMN_NAME"))
    assert(pk.options("fetchsize") === "50")
    assert(!pk.options.contains("dbtable"))
    val info = JdbcSnapshotSource.query("jdbc:mysql://db:3306/oms", "u", "p",
      "select * from information_schema.columns", fetchsize = 20,
      numPartitions = Some(5))
    assert(info.options("numPartitions") === "5")
  }

  test("JDBC binding fails offline at load() for the missing driver jar") {
    val e = intercept[Throwable] {
      JdbcSnapshotSource.table("jdbc:mysql://db:3306/oms", "u", "p", "t")
        .read(spark)
    }
    val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .toLowerCase
    assert(msg.contains("mysql") || msg.contains("driver") ||
      msg.contains("class"))
  }
}
