package graft

import org.apache.spark.sql.functions._
import graft.snapshot.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("bounds probe + parallel scan partitions by key range") {
    val snap = new Snapshot(spark, tmpDir("snaplog") + "/log")
    val src = spark.range(0, 1000).select($"id", ($"id" * 2).as("v"))
    assert(snap.probeBounds(src, "id").contains((0L, 999L)))
    val scanned = snap.parallelScan(src, Some("id"), numPartitions = 5)
    assert(scanned.rdd.getNumPartitions == 5)
    assert(scanned.count() == 1000)
    // keyless keeps the source's own parallelism — never a 1-partition
    // funnel (the reference's single-connection JDBC fallback would
    // serialize a whole-table scan at scale)
    val multi = src.repartition(8)
    assert(snap.parallelScan(multi, None).rdd.getNumPartitions == 8)
    assert(snap.parallelScan(multi, None).count() == 1000)
  }

  test("loadTable sanitizes columns, adds audit cols, logs watermark, skips on restart") {
    val root = tmpDir("snap")
    val snap = new Snapshot(spark, s"$root/log")
    val src = Seq((1L, "a", true), (2L, "b", false))
      .toDF("id", " Name With Space", "flag")

    assert(snap.loadTable(src, "t1", s"$root/t1", Some("id")))
    val out = spark.read.parquet(s"$root/t1")
    // sanitized name, boolean coerced to int, audit columns present
    assert(out.columns.contains("name_with_space"))
    assert(out.schema("flag").dataType == org.apache.spark.sql.types.IntegerType)
    assert(Seq("__op", "__dp_update_ts", "__tenant_id", "__rds_id")
      .forall(out.columns.contains))
    assert(out.filter(col("__op") === "r").count() == 2)

    // restart: watermark log skips the completed table
    assert(!snap.loadTable(src, "t1", s"$root/t1", Some("id")))
    assert(spark.read.parquet(s"$root/t1").count() == 2)
    // a different table still loads
    assert(snap.loadTable(src, "t2", s"$root/t2", Some("id")))
  }
}
