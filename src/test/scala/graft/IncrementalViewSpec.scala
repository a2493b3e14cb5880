package graft

import org.apache.spark.sql.functions._
import graft.ops.{CdcTable, IncrementalView}

/** Incremental materialized-view refresh from the change data feed must
  * equal the full recompute after every merge/DML step.
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.select(col("grp"), col(IncrementalView.CountCol), col("amt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
      .toSeq

  test("CDF-driven refresh equals the full recompute across merges and deletes") {
    val path = tmpDir("iview") + "/t"
    val t = new CdcTable(spark, path, Seq("id"), retainVersions = 10)
    t.init(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)).toDF("id", "grp", "amt"))
    val v1 = t.currentVersion.get
    var agg = IncrementalView.compute(t.read, Seq("grp"), Seq("amt"))
    assert(sorted(agg) == Seq(("a", 2L, 30L), ("b", 1L, 30L)))

    // merge: update 2's amount, move 3 to group a, insert 4 in c, delete 1
    t.merge(Seq(
      (2L, "a", 25L, 1L, "u"),
      (3L, "a", 30L, 1L, "u"),
      (4L, "c", 40L, 1L, "c"),
      (1L, null.asInstanceOf[String], 0L, 1L, "d"))
      .toDF("id", "grp", "amt", "ts", "__op"), "ts")
    val v2 = t.currentVersion.get

    agg = IncrementalView.refresh(agg, t.changesBetween(v1, v2), Seq("grp"), Seq("amt"))
    val full2 = IncrementalView.compute(t.read, Seq("grp"), Seq("amt"))
    assert(sorted(agg) == sorted(full2))
    // group b emptied out and must vanish, like the recompute drops it
    assert(!sorted(agg).exists(_._1 == "b"))

    // predicate DELETE wipes group a; refresh again
    t.delete(col("grp") === "a")
    val v3 = t.currentVersion.get
    agg = IncrementalView.refresh(agg, t.changesBetween(v2, v3), Seq("grp"), Seq("amt"))
    assert(sorted(agg) == sorted(IncrementalView.compute(t.read, Seq("grp"), Seq("amt"))))
    assert(sorted(agg) == Seq(("c", 1L, 40L)))
  }
}
