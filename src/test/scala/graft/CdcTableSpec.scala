package graft

import org.apache.spark.sql.functions._
import graft.ops.CdcTable

class CdcTableSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("unpartitioned table: init + merge upsert/delete round-trips parquet") {
    val path = tmpDir("cdctable") + "/t"
    val t = new CdcTable(spark, path, Seq("id"))
    t.init(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))
    val batch = Seq((2L, "b2", 2L, "u"), (3L, "c", 2L, "c"), (1L, null.asInstanceOf[String], 2L, "d"))
      .toDF("id", "v", "ts", "__op")
    t.merge(batch, "ts")
    val got = t.read.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "b2"), (3L, "c")))
  }

  test("merge is idempotent across restarts (same batch re-applied)") {
    val path = tmpDir("cdctable") + "/t"
    val t = new CdcTable(spark, path, Seq("id"))
    t.init(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))
    val batch = Seq((1L, "a2", 2L, "u"), (2L, "b", 2L, "c")).toDF("id", "v", "ts", "__op")
    t.merge(batch, "ts")
    val first = t.read.orderBy("id").collect().toSeq
    t.merge(batch, "ts")
    assert(t.read.orderBy("id").collect().toSeq == first)
  }

  test("first batch bootstraps the table, deletes filtered") {
    val path = tmpDir("cdctable") + "/t"
    val t = new CdcTable(spark, path, Seq("id"))
    t.merge(Seq((1L, "a", 1L, "c"), (2L, "gone", 1L, "d")).toDF("id", "v", "ts", "__op"), "ts")
    assert(t.read.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("partitioned merge rewrites only touched month partitions") {
    val path = tmpDir("cdctable") + "/t"
    val t = new CdcTable(spark, path, Seq("id"), partitionSource = Some("created_at"))
    t.init(Seq(
      (1L, "jan", ts("2024-01-10 00:00:00"), 1L),
      (2L, "feb", ts("2024-02-10 00:00:00"), 1L),
      (3L, "mar", ts("2024-03-10 00:00:00"), 1L)
    ).toDF("id", "v", "created_at", "ts"))

    val febFilesBefore = partFiles(path, "2024-02")
    val marFilesBefore = partFiles(path, "2024-03")

    // batch touches only January
    t.merge(
      Seq((1L, "jan2", ts("2024-01-10 00:00:00"), 2L, "u"),
          (4L, "jan-new", ts("2024-01-20 00:00:00"), 2L, "c"))
        .toDF("id", "v", "created_at", "ts", "__op"),
      "ts")

    // untouched partitions: same physical files (copy-on-write pruning)
    assert(partFiles(path, "2024-02") == febFilesBefore)
    assert(partFiles(path, "2024-03") == marFilesBefore)
    val got = t.read.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "jan2"), (2L, "feb"), (3L, "mar"), (4L, "jan-new")))
  }

  test("compaction rewrites to target file count, content unchanged") {
    val path = tmpDir("cdctable") + "/t"
    val t = new CdcTable(spark, path, Seq("id"))
    t.init(spark.range(1000).select($"id", ($"id" % 7).as("v")).repartition(8))
    val before = t.read.orderBy("id").collect().toSeq
    t.compact(1)
    assert(new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet")) == 1)
    assert(t.read.orderBy("id").collect().toSeq == before)
  }

  private def partFiles(path: String, month: String): Set[String] = {
    val d = new java.io.File(s"$path/${CdcTable.PartCol}=$month")
    Option(d.listFiles()).map(_.map(f => f.getName + ":" + f.lastModified()).toSet).getOrElse(Set.empty)
  }
}
