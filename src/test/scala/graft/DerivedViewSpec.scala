package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{CdcTable, DerivedView}

/** Incremental derived-table maintenance ([[graft.ops.DerivedView]]):
  * the CDF-refreshed `transform(source)` table must equal the flat
  * recompute after every window — including the case naive maintenance
  * gets wrong, a source update that SHRINKS its exploded row set (the
  * stale derived rows must delete, not linger).
  */
class DerivedViewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(n: Int) = java.sql.Timestamp.valueOf(f"2000-01-$n%02d 00:00:00")

  // doc -> one row per 2-word chunk (explode whose cardinality tracks
  // the text length, so updates can grow AND shrink the derived set)
  private def chunks(df: DataFrame): DataFrame = {
    val w = df.select(col("id"), split(col("text"), " ").as("words"))
    w.withColumn("chunk_id",
        explode(sequence(lit(0), ((size(col("words")) - 1) / 2).cast("int"))))
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("words"), col("chunk_id") * 2 + 1, lit(2)), " ").as("chunk"))
  }

  private def snap(df: DataFrame) =
    df.select("id", "chunk_id", "chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(t => (t._1, t._2)).toSeq

  test("refresh == recompute across shrink, grow, delete and insert; stale chunks die") {
    val root = tmpDir("derived")
    val source = new CdcTable(spark, s"$root/src", Seq("id"), retainVersions = 10)
    val view = new CdcTable(spark, s"$root/view", Seq("id", "chunk_id"), retainVersions = 10)
    source.init(Seq(
      (1L, "a b c d e f"), // 3 chunks
      (2L, "g h"),         // 1 chunk
      (3L, "i j k l")      // 2 chunks
    ).toDF("id", "text"))
    view.init(DerivedView.compute(source.read, chunks)
      .withColumn(DerivedView.TsCol, lit(ts(1))))
    assert(snap(view.read) == snap(chunks(source.read)))
    assert(view.read.count() == 6)

    val v0 = source.currentVersion.get
    source.merge(Seq(
      (1L, "x y", 2L, "u"),          // SHRINK 3 -> 1: chunks 1,2 must DELETE
      (2L, "g h i j k l", 2L, "u"),  // grow 1 -> 3
      (3L, null.asInstanceOf[String], 2L, "d"), // doc dies: both chunks go
      (4L, "m n o", 2L, "c")         // fresh doc: 2 chunks
    ).toDF("id", "text", "ts", "__op"), "ts")
    DerivedView.refresh(view, source, v0, source.currentVersion.get, chunks, ts(3))
    assert(snap(view.read.drop(DerivedView.TsCol)) == snap(chunks(source.read)))
    // the shrink case precisely: doc 1 has ONLY chunk 0, with the new text
    assert(snap(view.read).filter(_._1 == 1L) == Seq((1L, 0L, "x y")))
    assert(view.read.filter(col("id") === 3L).count() == 0)

    // an empty follow-up window is a no-op (and burns no view version)
    val v1 = source.currentVersion.get
    val vv = view.currentVersion.get
    DerivedView.refresh(view, source, v1, v1, chunks, ts(4))
    assert(view.currentVersion.contains(vv))
    assert(snap(view.read) == snap(chunks(source.read)))
  }

  test("an update that changes content but not cardinality upserts in place") {
    val root = tmpDir("derived2")
    val source = new CdcTable(spark, s"$root/src", Seq("id"), retainVersions = 10)
    val view = new CdcTable(spark, s"$root/view", Seq("id", "chunk_id"), retainVersions = 10)
    source.init(Seq((1L, "a b c d")).toDF("id", "text"))
    view.init(DerivedView.compute(source.read, chunks)
      .withColumn(DerivedView.TsCol, lit(ts(1))))
    val v0 = source.currentVersion.get
    source.merge(Seq((1L, "a b Z d", 2L, "u")).toDF("id", "text", "ts", "__op"), "ts")
    DerivedView.refresh(view, source, v0, source.currentVersion.get, chunks, ts(2))
    assert(snap(view.read) == Seq((1L, 0L, "a b"), (1L, 1L, "Z d")))
  }
}
