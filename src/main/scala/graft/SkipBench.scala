package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{CdcTable, FileSkipping, JoinView}

/** File-skipping effectiveness probe at a given SF (BASELINE.md's
  * read-side-skipping row): measures, on a key-clustered versioned copy
  * of `orders`,
  *
  *   1. a selective predicate scan through [[CdcTable.readWhere]]
  *      (stats-pruned) vs the plain `read.filter` full scan — wall time
  *      and files opened vs files total;
  *   2. an incremental JOIN-view refresh window (one changed dimension
  *      key) with the delta-derived IN-list pruning vs the same refresh
  *      forced through unpruned snapshot reads — wall time, plus the
  *      kept/total file counts of the pruned fact and dimension passes.
  *
  * The numbers back the r9/r10 design claim that maintenance reads open
  * only the files the delta's keys can live in; sf0.1 tables are too
  * small for skipping to move wall time, hence the sf1 point.
  *
  *   SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.SkipBench /tmp/skipbench"
  */
object SkipBench {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/skipbench")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
    rmrf(new java.io.File(root))

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val m = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // ---- 1. predicate scan: pruned vs full --------------------------------
    val orders = Tables(spark, sfDir, "orders")
    val fact = new CdcTable(spark, s"$root/orders", Seq("o_orderkey"), retainVersions = 5,
      bloomColumns = Seq("o_custkey"))
    val (_, tInit) = timed(fact.init(orders.repartitionByRange(64, col("o_orderkey"))))
    m("init_clustered") = tInit
    val hi = orders.agg(max("o_orderkey")).head.getLong(0)
    // a ~1%-of-keyspace window; each variant runs twice interleaved and
    // reports its best, so page-cache warmth cannot favor either side
    val preds = Seq(FileSkipping.Range("o_orderkey", Some(hi / 2), Some(hi / 2 + hi / 100)))
    val (kept, total) = fact.scanProfile(preds)
    def bestOf2(body: => Long): (Long, Double) = {
      val (n1, t1) = timed(body); val (n2, t2) = timed(body)
      require(n1 == n2); (n1, math.min(t1, t2))
    }
    val (nFull, tFull) = bestOf2(
      fact.read.filter(col("o_orderkey").between(hi / 2, hi / 2 + hi / 100)).count())
    val (nPruned, tPruned) = bestOf2(fact.readWhere(preds).count())
    require(nPruned == nFull, s"pruned scan diverged: $nPruned != $nFull")
    m("scan_pruned") = tPruned
    m("scan_full") = tFull

    // ---- 2. join-view refresh: one changed dim key ------------------------
    // Dimension-only window (the common enrichment-refresh shape): the
    // fact feed is EMPTY — passed as an empty frame, the way a caller
    // with a quiet fact side would — so the measured cost is exactly the
    // two snapshot passes the pruning targets: the fact fk-hit probe
    // (bloom + clone-range pruned) and the dimension partner scan.
    val customer = Tables(spark, sfDir, "customer")
    val dim = new CdcTable(spark, s"$root/customer", Seq("c_custkey"), retainVersions = 5)
    dim.init(customer.repartitionByRange(16, col("c_custkey")))
    val onCols = Seq("o_custkey" -> "c_custkey")
    val view = new CdcTable(spark, s"$root/view", Seq("o_orderkey"), retainVersions = 5)
    view.init(JoinView.compute(fact.read, dim.read, onCols)
      .withColumn(JoinView.TsCol, lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00"))))
    val (f0, d0) = (fact.currentVersion.get, dim.currentVersion.get)
    // the delta: ONE dimension key changes
    val ck = customer.agg(min("c_custkey")).head.getLong(0)
    dim.merge(customer.filter(col("c_custkey") === ck)
      .withColumn("c_acctbal", col("c_acctbal") * 2)
      .withColumn("__op", lit("u"))
      .withColumn("d_ts", lit(java.sql.Timestamp.valueOf("2001-01-02 00:00:00"))), "d_ts")
    dim.compact(16, clusterBy = Seq("c_custkey")) // re-cluster the merged dim
    val d2 = dim.currentVersion.get
    val emptyFactFeed = fact.readVersion(f0).limit(0)
      .withColumn(CdcTable.ChangeTypeCol, lit(""))

    var factPreds: Seq[FileSkipping.Pred] = Nil
    var dimPreds: Seq[FileSkipping.Pred] = Nil
    def refresh(pruned: Boolean): Long =
      JoinView.deltaBatch(
        emptyFactFeed,
        preds =>
          if (pruned) { factPreds = preds; fact.readWhereAt(f0, preds) }
          else fact.readVersion(f0),
        dim.changesBetween(d0, d2),
        preds =>
          if (pruned) { dimPreds = preds; dim.readWhereAt(d2, preds) }
          else dim.readVersion(d2),
        onCols, Seq("o_orderkey")).count()
    val (batchFull, tRefreshFull) = bestOf2(refresh(pruned = false))
    val (batchPruned, tRefreshPruned) = bestOf2(refresh(pruned = true))
    require(batchPruned == batchFull,
      s"pruned refresh diverged: $batchPruned != $batchFull rows")
    m("jv_refresh_pruned") = tRefreshPruned
    m("jv_refresh_full") = tRefreshFull
    val (fKept, fTotal) = fact.scanProfileAt(f0, factPreds)
    val (dKept, dTotal) = dim.scanProfileAt(d2, dimPreds)

    // ---- 3. z-order vs linear layout: files opened under a 2-dim box ------
    // the same orders rows compacted two ways; the probe is a box
    // predicate selective on BOTH dims (~1/8 of each dimension's range).
    // A linear (x, y) sort is tight on x only; Morton clustering is
    // tight-ish on both, so it opens fewer files — the compact(zorderBy)
    // claim measured at sf scale.
    val ckHi = orders.agg(max("o_custkey")).head.getLong(0)
    val (pLo, pHi) = {
      val r = orders.agg(min("o_totalprice"), max("o_totalprice")).head
      (r.getDouble(0), r.getDouble(1))
    }
    val box = Seq(
      FileSkipping.Range("o_custkey", Some(ckHi / 2), Some(ckHi / 2 + ckHi / 8)),
      FileSkipping.Range("o_totalprice", Some(pLo), Some(pLo + (pHi - pLo) / 8)))
    def layout(name: String, zorder: Boolean): (CdcTable, Double) = {
      val t = new CdcTable(spark, s"$root/$name", Seq("o_orderkey"), retainVersions = 5)
      t.init(orders)
      val (_, tc) = timed(
        if (zorder) t.compact(target = 64, zorderBy = Seq("o_custkey", "o_totalprice"))
        else t.compact(target = 64, clusterBy = Seq("o_custkey", "o_totalprice")))
      (t, tc)
    }
    val (zt, tZCompact) = layout("orders_z", zorder = true)
    val (lt, tLCompact) = layout("orders_lin", zorder = false)
    m("zorder_compact") = tZCompact
    m("linear_compact") = tLCompact
    val (zBoxKept, zBoxTotal) = zt.scanProfile(box)
    val (lBoxKept, lBoxTotal) = lt.scanProfile(box)
    val (nZ, tZScan) = bestOf2(zt.readWhere(box).count())
    val (nL, tLScan) = bestOf2(lt.readWhere(box).count())
    require(nZ == nL, s"z-order scan diverged: $nZ != $nL")
    m("zorder_box_scan") = tZScan
    m("linear_box_scan") = tLScan
    // trailing-dim-only probe: the case a linear sort cannot skip at all
    val yOnly = Seq(box(1))
    val (zyKept, _) = zt.scanProfile(yOnly)
    val (lyKept, _) = lt.scanProfile(yOnly)

    // ---- 4. metadata-answered aggregates: files opened vs a scan ----------
    // COUNT over the same ~1%-of-keyspace window: the scan opens `kept`
    // files; the metadata count opens only the BOUNDARY files the window's
    // edges cut through, and COUNT(*)/MIN/MAX open zero
    val cntProfile = fact.countWhereProfile(preds)
    val (nCnt, tMetaCount) = bestOf2(fact.countWhere(preds))
    require(nCnt == nFull, s"metadata count diverged: $nCnt != $nFull")
    val (_, tMetaAll) = bestOf2(fact.countWhere(Nil))
    m("count_meta_window") = tMetaCount
    m("count_meta_all") = tMetaAll

    val qs = m.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"scan_files":{"kept":$kept,"total":$total},""" +
      s""""jv_fact_files":{"kept":$fKept,"total":$fTotal},""" +
      s""""jv_dim_files":{"kept":$dKept,"total":$dTotal},""" +
      s""""zorder_box_files":{"kept":$zBoxKept,"total":$zBoxTotal},""" +
      s""""linear_box_files":{"kept":$lBoxKept,"total":$lBoxTotal},""" +
      s""""trailing_dim_files":{"zorder":$zyKept,"linear":$lyKept},""" +
      s""""box_rows":$nZ,""" +
      s""""count_files":{"full":${cntProfile.fullFiles},"scanned":${cntProfile.scannedFiles},""" +
      s""""pruned":${cntProfile.prunedFiles}},""" +
      s""""batch_rows":$batchPruned,"timings":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
