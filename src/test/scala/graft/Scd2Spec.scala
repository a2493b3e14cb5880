package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd2

/** SCD2 incremental maintenance: changes version, no-changes don't,
  * new keys appear, history is immutable, late batches are ignored.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "city", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet

  test("apply versions changed keys, skips unchanged, inserts new, keeps history immutable") {
    val dim0 = Scd2.init(
      Seq((1L, "nyc", 10L), (2L, "sfo", 10L), (3L, "chi", 10L)).toDF("id", "city", "ts"),
      Seq("id"), "ts")
    assert(rows(dim0) == Set((1L, "nyc", 10L, -1L), (2L, "sfo", 10L, -1L), (3L, "chi", 10L, -1L)))

    // batch 2: id=1 moves, id=2 unchanged, id=4 new
    val dim1 = Scd2.apply(dim0,
      Seq((1L, "bos", 20L), (2L, "sfo", 20L), (4L, "aus", 20L)).toDF("id", "city", "ts"),
      Seq("id"), "ts")
    assert(rows(dim1) == Set(
      (1L, "nyc", 10L, 20L), (1L, "bos", 20L, -1L),
      (2L, "sfo", 10L, -1L),
      (3L, "chi", 10L, -1L),
      (4L, "aus", 20L, -1L)))

    // batch 3: id=1 moves again — the closed nyc row must pass through untouched
    val dim2 = Scd2.apply(dim1,
      Seq((1L, "sea", 30L)).toDF("id", "city", "ts"), Seq("id"), "ts")
    assert(rows(dim2) == Set(
      (1L, "nyc", 10L, 20L), (1L, "bos", 20L, 30L), (1L, "sea", 30L, -1L),
      (2L, "sfo", 10L, -1L),
      (3L, "chi", 10L, -1L),
      (4L, "aus", 20L, -1L)))

    // a replayed/late batch (ts at or before the current valid_from)
    // changes nothing — idempotent under redelivery
    val dim3 = Scd2.apply(dim2,
      Seq((1L, "old", 30L), (2L, "old", 5L)).toDF("id", "city", "ts"), Seq("id"), "ts")
    assert(rows(dim3) == rows(dim2))

    // an observation without a time cannot be sequenced: dropped, and it
    // must not fabricate an all-null "current" row for its key
    val dim4 = Scd2.apply(dim3,
      Seq((9L, "nowhere")).toDF("id", "city").withColumn("ts", lit(null).cast("long")),
      Seq("id"), "ts")
    assert(rows(dim4) == rows(dim3))
  }

  test("as-of lookup reads the state at any past time") {
    val dim = Scd2.apply(
      Scd2.init(Seq((1L, "nyc", 10L)).toDF("id", "city", "ts"), Seq("id"), "ts"),
      Seq((1L, "bos", 20L)).toDF("id", "city", "ts"), Seq("id"), "ts")
    def asOf(t: Long) = dim
      .filter(col("valid_from") <= t && (col("valid_to").isNull || col("valid_to") > t))
      .select("city").as[String].collect().toSeq
    assert(asOf(15L) == Seq("nyc"))
    assert(asOf(25L) == Seq("bos"))
    assert(asOf(5L).isEmpty)
  }
}
