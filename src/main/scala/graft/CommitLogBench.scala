package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commit-log growth probe: a long-lived table is thousands of 5-minute
  * micro-batch commits, not tens — this drives ONE month-partitioned
  * table through `N` (default 1000) small merges and measures, against
  * the commit INDEX, the cost of everything that touches the log:
  * merge wall, `history()`, time travel to the oldest retained version,
  * a pruned read, and the root-directory entry count (the physical
  * footprint expire/GC must keep bounded).
  *
  * What bounded-vs-growing looks like here: every version writes a full
  * manifest SNAPSHOT (size ∝ live file count, never commit count), and
  * expire() deletes version dirs past `retainVersions` and GCs
  * unreferenced commit dirs — so per-commit cost must go FLAT once the
  * table reaches its steady-state file count. Any term that instead
  * grows with the cumulative commit index is a 100 TB-table killer
  * (years of micro-batches ≈ 100k commits), and this probe exists to
  * catch it with a measurement rather than an argument.
  *
  *   SPARK_GRAFT_CPUS=8 sbt "runMain graft.CommitLogBench /root/testdata/sf0.001 /tmp/commitlog 1000"
  *
  * Prints one TSV row per sampled commit window (and writes them to
  * `<root>/commitlog.tsv`): window, merges/s, avg merge ms, history ms,
  * oldest-retained read ms, pruned-read ms, root entries, manifest rows.
  */
object CommitLogBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val root = args.lift(1).getOrElse("/tmp/commitlog")
    val nCommits = args.lift(2).map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    new java.io.File(root).mkdirs()

    val orders = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .localCheckpoint()
    val t = new graft.ops.CdcTable(spark, s"$root/t", keys = Seq("o_orderkey"),
      partitionSource = Some("o_orderdate"), retainVersions = 10)
    t.init(orders)

    // micro-batch shape: each commit re-prices ~100 rows of ONE rotating
    // key slot — the "current partition is hot" steady state. The batch
    // plans are all derived from the one checkpointed snapshot, so the
    // probe times the COMMIT PROTOCOL, not query planning on a deep
    // lineage.
    val nKeys = orders.count()
    val slotCount = math.max(1L, nKeys / 100L)
    val batches = (0 until 16).map { s =>
      orders.filter(pmod(col("o_orderkey"), lit(slotCount)) === (s % slotCount))
        .withColumn("o_totalprice", col("o_totalprice") * lit(1.0001))
        .withColumn("__op", lit("u"))
        .localCheckpoint()
    }

    val out = new StringBuilder
    def emit(line: String): Unit = { println(line); out.append(line).append('\n'): Unit }
    emit(Seq("commits", "merge_ms_avg", "history_ms", "oldest_read_ms",
      "pruned_read_ms", "root_entries", "manifest_rows").mkString("\t"))

    def ms[A](body: => A): (A, Long) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1000000L)
    }
    val window = math.max(1, nCommits / 10)
    var done = 0
    while (done < nCommits) {
      val t0 = System.nanoTime()
      val n = math.min(window, nCommits - done)
      (0 until n).foreach { i =>
        val ts = lit(java.sql.Timestamp.valueOf("2002-01-01 00:00:00"))
        t.merge(batches((done + i) % batches.size).withColumn("__ts", ts), "__ts")
      }
      done += n
      val mergeAvg = (System.nanoTime() - t0) / 1000000L / n
      val (hist, histMs) = ms(t.history.count())
      val oldest = t.history.agg(min("version")).head.getLong(0)
      val (_, oldMs) = ms(t.readVersion(oldest).count())
      val (_, prunedMs) = ms(t.readWhere(Seq(graft.ops.FileSkipping.Range(
        "o_orderdate",
        Some(java.sql.Timestamp.valueOf("1996-06-01 00:00:00")),
        Some(java.sql.Timestamp.valueOf("1996-06-30 23:59:59"))))).count())
      val rootEntries = Option(new java.io.File(s"$root/t").list()).fold(0)(_.length)
      val manifestRows = t.filesInfo.count()
      emit(Seq(done, mergeAvg, histMs, oldMs, prunedMs, rootEntries, manifestRows)
        .mkString("\t"))
      assert(hist <= 10 + 1, s"history rows $hist exceed retainVersions — expire broke")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "commitlog.tsv"), out.toString)
    spark.stop()
  }
}
