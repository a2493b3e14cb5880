package graft

import graft.ops.{CdcTable, Dml, FileSkipping}
import org.apache.spark.sql.functions._

/** Day-granularity partitioning (the Iceberg `days(col)` transform):
  * keys mint as yyyy-MM-dd, the whole manifest/pruning/retention/
  * maintenance machinery works per day, and the granularity round-trips
  * through _table_meta and the statement surface.
  */
class DayPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("days(col) CTAS: day keys, day-pruned scans, day-scoped rewrite and retention") {
    val root = tmpDir("daypart")
    val path = (n: String) => s"$root/$n"
    Seq(
      (1L, "a", ts("2001-01-01 10:00:00")),
      (2L, "b", ts("2001-01-01 11:00:00")),
      (3L, "c", ts("2001-01-02 10:00:00")),
      (4L, "d", ts("2001-01-03 10:00:00"))
    ).toDF("id", "v", "created").createOrReplaceTempView("day_src")
    Dml.execute(spark,
      "CREATE TABLE t KEYED BY (id) PARTITIONED BY (days(created)) AS SELECT * FROM day_src",
      path)

    val t = CdcTable.open(spark, path("t"))
    assert(t.partitionGranularity == "day", "granularity must round-trip through _table_meta")
    val parts = t.partitions.select("partition").as[String].collect().toSorted
    assert(parts == Seq("2001-01-01", "2001-01-02", "2001-01-03"), s"got $parts")

    // a merge touching one day leaves the other days' files byte-identical
    val before = t.filesInfo.collect().map(r => (r.getString(0), r.getString(1))).toSet
    t.merge(Seq((3L, "c2", ts("2001-01-02 10:00:00"), 2L, "u"))
      .toDF("id", "v", "created", "mts", "__op"), "mts")
    val after = t.filesInfo.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(after.filter(t => t._1.contains("2001-01-01") || t._1.contains("2001-01-03")) ==
      before.filter(t => t._1.contains("2001-01-01") || t._1.contains("2001-01-03")),
      "untouched days must carry over")
    assert(t.read.filter(col("id") === 3L).select("v").head().getString(0) == "c2")

    // a day-range predicate prunes whole day directories from the scan:
    // scanProfile's totals are post-manifest-pruning, so compare the
    // predicated profile's universe against the unpredicated one
    val (_, dayFiles) = t.scanProfile(Seq(FileSkipping.Range("created",
      Some("2001-01-02"), Some("2001-01-02"))))
    val (_, allFiles) = t.scanProfile(Nil)
    assert(dayFiles < allFiles,
      s"day pruning must drop directories: considered=$dayFiles of $allFiles")
    assert(t.readWhere(Seq(FileSkipping.Range("created",
      Some("2001-01-02"), Some("2001-01-02 23:59:59")))).count() == 1)

    // day-granular retention cut
    val dropped = t.retainMonthsFrom("2001-01-02")
    assert(dropped == Set("2001-01-01"))
    assert(t.read.count() == 2)
    // month-format cut on a day table rejects loudly
    intercept[IllegalArgumentException] { t.retainMonthsFrom("2001-01") }

    // DESCRIBE TABLE surfaces the granularity
    val desc = Dml.query(spark, "DESCRIBE TABLE t", path)
      .as[(String, String, String)].collect().toSeq
    assert(desc.contains(("# partition_granularity", "day", "")))
  }

  test("hours(col) granularity: hour keys, hour retention") {
    val root = tmpDir("hourpart")
    val path = (n: String) => s"$root/$n"
    Seq(
      (1L, "a", ts("2001-01-01 10:30:00")),
      (2L, "b", ts("2001-01-01 11:30:00")),
      (3L, "c", ts("2001-01-01 12:30:00"))
    ).toDF("id", "v", "created").createOrReplaceTempView("hour_src")
    Dml.execute(spark,
      "CREATE TABLE h KEYED BY (id) PARTITIONED BY (hours(created)) AS SELECT * FROM hour_src",
      path)
    val t = CdcTable.open(spark, path("h"))
    assert(t.partitionGranularity == "hour")
    assert(t.partitions.select("partition").as[String].collect().toSorted ==
      Seq("2001-01-01-10", "2001-01-01-11", "2001-01-01-12"))
    assert(t.retainMonthsFrom("2001-01-01-11") == Set("2001-01-01-10"))
    assert(t.read.count() == 2)
  }

  test("hour pruning with string timestamp bounds: space/T separators normalize to the key alphabet") {
    val root = tmpDir("hourprune")
    val t = new CdcTable(spark, s"$root/t", Seq("id"),
      partitionSource = Some("created"), partitionGranularity = "hour")
    t.init(Seq(
      (1L, "a", ts("2001-01-01 10:30:00")),
      (2L, "b", ts("2001-01-01 11:30:00")),
      (3L, "c", ts("2001-01-01 12:30:00"))
    ).toDF("id", "v", "created"))
    // hour keys are 'yyyy-MM-dd-HH'; a '2001-01-01 11:30:00' bound
    // truncates to '2001-01-01 11' with a SPACE at index 10 — unmapped,
    // ' ' < '-' makes the upper-bound check reject the -11 dir that
    // holds the qualifying row (and 'T' breaks the lower bound the
    // other way). Both separators must normalize before comparing.
    val upper = t.readWhere(Seq(FileSkipping.Range("created",
      None, Some("2001-01-01 11:30:00"))))
    assert(upper.select("id").as[Long].collect().toSet == Set(1L, 2L),
      "space-separated upper bound must keep the -11 hour partition")
    val lowerIso = t.readWhere(Seq(FileSkipping.Range("created",
      Some("2001-01-01T11:30:00"), None)))
    assert(lowerIso.select("id").as[Long].collect().toSet == Set(2L, 3L),
      "T-separated lower bound must keep the -11 hour partition")
    // and pruning still actually prunes: the upper-bound scan must
    // consider fewer files than the full table
    val (_, kept) = t.scanProfile(Seq(FileSkipping.Range("created",
      None, Some("2001-01-01 11:30:00"))))
    val (_, all) = t.scanProfile(Nil)
    assert(kept < all, s"hour pruning must drop the -12 dir: kept=$kept of $all")
    assert(t.countWhere(Seq(FileSkipping.Range("created",
      None, Some("2001-01-01 11:30:00")))) == 2L)
  }

  test("a handle disagreeing with the committed partition layout refuses to commit") {
    val root = tmpDir("daypartguard")
    val t = new CdcTable(spark, s"$root/t", Seq("id"),
      partitionSource = Some("created"), partitionGranularity = "day")
    t.init(Seq((1L, "a", ts("2001-01-01 10:00:00"))).toDF("id", "v", "created"))
    // a month-granularity handle on the same day table must not mint
    // month keys into the day manifest
    val wrong = new CdcTable(spark, s"$root/t", Seq("id"),
      partitionSource = Some("created"))
    val e = intercept[IllegalArgumentException] {
      wrong.append(Seq((2L, "b", ts("2001-01-02 10:00:00"))).toDF("id", "v", "created"))
    }
    assert(e.getMessage.contains("CdcTable.open"))
    // the committed state is untouched and the correct handle still works
    assert(CdcTable.open(spark, s"$root/t").read.count() == 1)
    t.append(Seq((2L, "b", ts("2001-01-02 10:00:00"))).toDF("id", "v", "created"))
    assert(t.read.count() == 2)
  }

  private implicit class Sorted(xs: Array[String]) {
    def toSorted: Seq[String] = xs.toSeq.sorted
  }
}
