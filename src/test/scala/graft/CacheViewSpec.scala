package graft

import org.apache.spark.sql.execution.LogicalRDD

/** Shared-view materialization (Tables.cacheView): mode selection
  * (local vs reliable checkpoint), plan-identity reuse, and eager
  * release of replaced entries' blocks.
  */
class CacheViewSpec extends SparkSpec {
  import spark.implicits._

  private def isRddLeaf(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst { case _: LogicalRDD => () }.isDefined

  test("local mode (default) serves an ExistingRDD leaf and reuses the same computation") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val served = Tables.cacheView("cv_spec_local", df)
    assert(isRddLeaf(served), "cacheView must serve a checkpointed leaf")
    assert(served.count() === 2)
    val again = Tables.cacheView("cv_spec_local", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(again eq served, "same computation must reuse the live materialization")
  }

  test("reliable mode checkpoints to the checkpoint dir and survives as a recomputable leaf") {
    spark.conf.set(Tables.ViewCheckpointModeKey, "reliable")
    try {
      val df = Seq((10L, "x"), (11L, "y"), (12L, "z")).toDF("id", "v")
      val served = Tables.cacheView("cv_spec_reliable", df)
      assert(isRddLeaf(served))
      assert(served.count() === 3)
      // a reliable checkpoint actually wrote files under the checkpoint dir
      val dir = spark.sparkContext.getCheckpointDir
      assert(dir.isDefined, "reliable mode must establish a checkpoint dir")
      val files = new java.io.File(new java.net.URI(dir.get).getPath).listFiles()
      assert(files != null && files.nonEmpty, s"no checkpoint data under ${dir.get}")
    } finally spark.conf.set(Tables.ViewCheckpointModeKey, "local")
  }

  test("a changed computation under the same name replaces the served view") {
    Tables.cacheView("cv_spec_swap", Seq(1L).toDF("id"))
    val swapped = Tables.cacheView("cv_spec_swap", Seq(1L, 2L, 3L).toDF("id"))
    assert(swapped.count() === 3)
    assert(spark.sql("SELECT count(*) FROM cv_spec_swap").head().getLong(0) === 3L)
  }
}
