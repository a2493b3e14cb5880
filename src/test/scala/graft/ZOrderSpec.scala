package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

/** Z-order layout clustering: every output partition must be tight on
  * BOTH dimensions simultaneously (the multi-dim file-skipping property),
  * which a linear sort cannot provide for the trailing dimension.
  */
class ZOrderSpec extends SparkSpec {

  private def meanRange(df: org.apache.spark.sql.DataFrame, dim: String): Double = {
    val parts = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max(col(dim)) - min(col(dim))).as("rng"))
      .collect()
      .map(_.getAs[Long]("rng").toDouble)
    parts.sum / parts.length
  }

  test("z-order clustering is tight on both dimensions; linear sort is not") {
    import spark.implicits._
    // full 256x256 grid, shuffled hash order (as data arrives in practice)
    val grid = spark
      .range(256L * 256L)
      .select((col("id") / 256).cast("long").as("x"), (col("id") % 256).cast("long").as("y"))
      .orderBy(hash(col("x"), col("y")))

    val z = ZOrder.cluster(grid, 16, 8, col("x"), col("y")).cache()
    try {
      // row preservation
      assert(z.count() === 256L * 256L)
      assert(z.select(countDistinct(col("x"), col("y"))).as[Long].head() === 256L * 256L)

      // 16 z-range partitions of an 8-bit Morton space are 64x64-ish
      // regions: mean per-partition extent far below the 255 global range
      // on BOTH dims. A boundary partition can straddle two regions, so
      // the bound is loose (<=128), but far from unclustered (~255).
      val zx = meanRange(z, "x")
      val zy = meanRange(z, "y")
      assert(zx <= 128.0, s"z-order x extent too wide: $zx")
      assert(zy <= 128.0, s"z-order y extent too wide: $zy")

      // linear sort on x: perfect x locality, zero y locality
      val linear = grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      val lx = meanRange(linear, "x")
      val ly = meanRange(linear, "y")
      assert(lx <= 32.0, s"linear sort should be tight on x: $lx")
      assert(ly >= 250.0, s"linear sort should be loose on y: $ly")
      assert(zy < ly / 2, s"z-order must beat linear sort on the trailing dim: $zy vs $ly")
    } finally z.unpersist()
  }

  test("compact(zorderBy) makes files skippable on BOTH dims; linear clusterBy only on the leading one") {
    import spark.implicits._
    import graft.ops.{CdcTable, FileSkipping}
    val grid = spark
      .range(128L * 128L)
      .select(col("id").as("id"),
        (col("id") / 128).cast("long").as("x"), (col("id") % 128).cast("long").as("y"))
      .orderBy(hash(col("x"), col("y")))
    val root = tmpDir("zcompact")

    def keptUnder(t: CdcTable, preds: Seq[FileSkipping.Pred]): (Int, Int) = t.scanProfile(preds)
    // a 2-dim box predicate: 1/8 of x-space and 1/8 of y-space
    val box = Seq(
      FileSkipping.Range("x", Some(0L), Some(15L)),
      FileSkipping.Range("y", Some(0L), Some(15L)))

    val zt = new CdcTable(spark, s"$root/z", Seq("id"), retainVersions = 5)
    zt.init(grid)
    zt.compact(target = 16, zorderBy = Seq("x", "y"))
    val (zKept, zTotal) = keptUnder(zt, box)

    val lt = new CdcTable(spark, s"$root/l", Seq("id"), retainVersions = 5)
    lt.init(grid)
    lt.compact(target = 16, clusterBy = Seq("x", "y")) // linear: tight on x only
    val (lKept, lTotal) = keptUnder(lt, box)

    // content is unchanged by either layout
    assert(zt.read.count() == 128L * 128L && lt.read.count() == 128L * 128L)
    assert(zt.readWhere(box).count() == lt.readWhere(box).count())
    // the box touches 1/64 of the space: the z-ordered table opens a
    // small fraction of its files; the linear layout prunes on x alone
    // (>= its x share) and cannot use y at all
    assert(zTotal >= 8 && lTotal >= 8, s"want real file counts, got $zTotal/$lTotal")
    // <=: the box spans 1/64 of the space, so both layouts land in the
    // 1-3 file range and range-partition SAMPLING decides whether a
    // boundary falls inside the box (file listing order perturbs the
    // sample under parallel suites) — the strict z-order advantage is
    // the trailing-dim assertion below, which no boundary jitter affects
    assert(zKept <= lKept && zKept <= 3,
      s"z-order must stay competitive under the 2-dim box: $zKept/$zTotal vs $lKept/$lTotal")
    // and on the TRAILING dim alone the linear layout keeps everything
    val yOnly = Seq(FileSkipping.Range("y", Some(0L), Some(15L)))
    val (zyKept, _) = keptUnder(zt, yOnly)
    val (lyKept, _) = keptUnder(lt, yOnly)
    assert(zyKept < lyKept,
      s"z-order must skip on the trailing dim: $zyKept vs $lyKept of $lTotal")
  }

  test("interleave places bits as documented and bucketize clamps") {
    import spark.implicits._
    // x=3 (bits 0,1), y=1 (bit 0): key = x0<<0 | y0<<1 | x1<<2 = 1 + 2 + 4
    val row = Seq((3L, 1L)).toDF("x", "y")
    val key = row.select(ZOrder.interleave(2, col("x"), col("y")).as("k")).as[Long].head()
    assert(key === 7L)

    val b = Seq((-5.0), (0.0), (999.0), (50.0))
      .toDF("v")
      .select(ZOrder.bucketize(col("v"), 0.0, 100.0, 4).as("b"))
      .as[Long]
      .collect()
      .toSeq
    assert(b === Seq(0L, 0L, 3L, 2L))
  }
}
