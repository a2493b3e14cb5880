package graft

import org.apache.spark.sql.functions._
import graft.ops.Retry

/** Source/sink format breadth beyond parquet: csv (schema'd), json
  * (lines), orc — all round-trip through the engine's tables; plus the
  * retry wrapper and partition-pruned reads of hive-layout tables.
  */
class SourceFormatsSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "a", 10.5, "2024-01-01 00:00:00"),
    (2L, "b", 20.25, "2024-02-01 00:00:00"),
    (3L, "c", -3.0, "2024-02-15 12:30:00")
  ).toDF("id", "name", "amount", "ts_s")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("csv round-trip with explicit schema and header") {
    val dir = tmpDir("fmt") + "/csv"
    sample.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(sample.schema).csv(dir)
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }

  test("json-lines round-trip") {
    val dir = tmpDir("fmt") + "/json"
    sample.write.json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }

  test("orc round-trip") {
    val dir = tmpDir("fmt") + "/orc"
    sample.write.orc(dir)
    assert(spark.read.orc(dir).orderBy("id").collect().toSeq ==
      sample.orderBy("id").collect().toSeq)
  }

  test("hive-partitioned write prunes partitions on read (scan sees one)") {
    val dir = tmpDir("fmt") + "/part"
    sample.withColumn("month", date_format(col("ts"), "yyyy-MM"))
      .write.partitionBy("month").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("month") === "2024-02")
    assert(pruned.count() == 2)
    // the file index must select only the matching partition directory
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.relation.location.inputFiles.forall(_.contains("month=2024-02")) ||
      scan.metadata.get("PartitionFilters").exists(_.contains("month")))
  }

  test("source-adapter seam: swapped envelope + snapshot sources drive the unchanged pipelines") {
    import graft.sources.{EnvelopeSource, SnapshotSource}
    val root = tmpDir("seam")
    // envelope rows serialized as JSON-lines — a different wire format
    // entirely; only the source adapter knows, CdcPipeline is untouched
    // (the same slot a real Kafka reader would fill)
    val events = Seq(
      (1L, new java.sql.Timestamp(1000L), 1L, "click", 1.0, "{}"),
      (2L, new java.sql.Timestamp(2000L), 2L, "signup", 2.0, "{}"),
      (3L, new java.sql.Timestamp(3000L), 3L, "error", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    graft.envelope.EnvelopeCodec.synthesize(events).write.json(s"$root/env")
    val jsonSource = new EnvelopeSource {
      def readStream(s: org.apache.spark.sql.SparkSession) =
        s.readStream.schema(EnvelopeSource.schema).json(s"$root/env")
    }
    new graft.cdc.CdcPipeline(spark, jsonSource, s"$root/ckpt", s"$root/tables").runOnce()
    val t = new graft.ops.CdcTable(spark, s"$root/tables/events", Seq("event_id")).read
    // the 'error' row is a delete — full decode/merge semantics intact
    assert(t.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    // fake in-memory snapshot source standing in for the JDBC reader
    val fake = new SnapshotSource {
      def read(s: org.apache.spark.sql.SparkSession) = sample
    }
    val snap = new graft.snapshot.Snapshot(spark, s"$root/log")
    assert(snap.load(fake, "acc", s"$root/sink", Some("id")))
    assert(spark.read.parquet(s"$root/sink").count() == 3)
    // watermark log consulted through the same seam: second load skips
    assert(!snap.load(fake, "acc", s"$root/sink", Some("id")))
  }

  test("retry wrapper: transient failures retried, success propagated, budget respected") {
    var calls = 0
    val got = Retry.withRetries(attempts = 5, backoffMs = 1L)() {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(got == 42 && calls == 3)

    var n = 0
    val e = intercept[RuntimeException] {
      Retry.withRetries(attempts = 3, backoffMs = 1L)() {
        n += 1; throw new RuntimeException(s"always $n")
      }
    }
    assert(n == 3 && e.getMessage == "always 3")
  }
}
