package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Merge/DML scaling probe: the query slope table (BASELINE.md) covers
  * reads; this times the WRITE path — lineitem as a month-partitioned
  * [[graft.ops.CdcTable]], a 1%-churn CDC merge, the change feed, a
  * predicate UPDATE, keyless appends and a compaction cycle — at a given
  * SF so the sf0.1 -> sf1 slope of the lakehouse layer itself is
  * measured, not argued.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.CdcScaleBench /root/testdata/sf0.1 /tmp/cdcbench"
  */
object CdcScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val root = args.lift(1).getOrElse("/tmp/cdcbench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Verify/specs: CdcTable's month bucketing uses the
      // session zone — benched partitioning must match the verified one
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

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      timings(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    val li = Tables(spark, sfDir, "lineitem")
    val nRows = li.count()
    // the synthetic lineitem is only unique on the 4-column composite
    // (456k distinct (orderkey, linenumber) pairs in 600k rows at sf0.1)
    val t = new graft.ops.CdcTable(spark, s"$root/li",
      keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      partitionSource = Some("l_shipdate"), retainVersions = 10)

    time("init")(t.init(li))
    val v1 = t.currentVersion.get

    // 1%-churn CDC batch: 60% re-priced updates, 20% deletes, 20%
    // inserts under fresh keys — hash-gated so the batch is
    // deterministic and spread over all months (the worst pruning case:
    // every month is hot)
    val slot = pmod(hash(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")), lit(1000))
    val ts = lit(java.sql.Timestamp.valueOf("2002-01-01 00:00:00"))
    val ups = li.filter(slot < 6)
      .withColumn("l_extendedprice", col("l_extendedprice") * 1.1)
      .withColumn("__op", lit("u"))
    val dels = li.filter(slot >= 6 && slot < 8).withColumn("__op", lit("d"))
    val ins = li.filter(slot >= 8 && slot < 10)
      .withColumn("l_orderkey", col("l_orderkey") + lit(1000000000L))
      .withColumn("__op", lit("c"))
    val batch = ups.unionByName(dels).unionByName(ins).withColumn("__ts", ts)
    val nBatch = time("merge_1pct")(
      { t.merge(batch, "__ts"); t.currentVersion.get })
    val v2 = nBatch

    val nChanges = time("change_feed")(t.changesBetween(v1, v2).count())

    // predicate UPDATE touching one month (the partition-pruned COW path)
    time("update_dml")(t.update(
      col("l_shipdate") >= lit("1996-06-01") && col("l_shipdate") < lit("1996-07-01")
        && col("l_returnflag") === "R",
      Map("l_discount" -> lit(0.01))))

    // four small keyless appends into one month, then the compaction
    // policy folds that month (cold months stay byte-identical)
    val extra = li.filter(slot === 0)
      .withColumn("l_orderkey", col("l_orderkey") + lit(2000000000L))
    time("appends_x4")((1 to 4).foreach(_ => t.append(extra.limit(500))))
    val compacted = time("compact_cycle")(t.compactIfNeeded(maxFiles = 4))

    // ---- skewed WRITE path (r15 verdict: the zipf fixture measured
    // reads only). Three production churn skews, each sized near the 1%
    // batch so wall times compare row-for-row; the sf1-vs-sf1z contrast
    // on the SAME step isolates what key skew costs the merge itself.

    // (a) hot-MONTH churn — every row of one month re-priced (a
    // backfill). The partition-concentrated write: pruning confines the
    // rewrite to 1 of 84 months, so despite carrying ~1.2x the 1%
    // batch's rows this should be cheaper than the all-months-hot merge.
    val ts2 = lit(java.sql.Timestamp.valueOf("2002-01-02 00:00:00"))
    val hotMonth = li
      .filter(col("l_shipdate") >= lit("1996-06-01") && col("l_shipdate") < lit("1996-07-01"))
      .withColumn("l_extendedprice", col("l_extendedprice") * 1.05)
      .withColumn("__op", lit("u")).withColumn("__ts", ts2)
    val nHotMonth = hotMonth.count()
    time("merge_hotmonth")(t.merge(hotMonth, "__ts"))

    // (b) hot-KEY churn — updates drawn only from the 5 hottest order
    // keys, gated to ~1% of the table. On the zipf dirs those keys carry
    // ~30% of all rows so the gate bites; on uniform dirs they hold ~80
    // rows total and the step degenerates (the meaningful contrast is
    // sf1z merge_hotkey vs sf1z merge_1pct: same data, same batch size,
    // clustered vs spread keys).
    val hotRows = li.filter(col("l_orderkey") < 5)
    val nHotRows = hotRows.count()
    val keepPerMille = math.min(1000L, math.max(1L, (nRows / 100L) * 1000L / math.max(1L, nHotRows)))
    val ts3 = lit(java.sql.Timestamp.valueOf("2002-01-03 00:00:00"))
    val hotBatch = hotRows.filter(slot < lit(keepPerMille))
      .withColumn("l_extendedprice", col("l_extendedprice") * 1.02)
      .withColumn("__op", lit("u")).withColumn("__ts", ts3)
    val nHotBatch = hotBatch.count()
    time("merge_hotkey")(t.merge(hotBatch, "__ts"))

    // (c) SINGLE-key skew — a user-state table keyed on user_id alone,
    // fed by the event stream (every event upserts its user's latest
    // state). Under the zipf dirs one user carries ~7% of all events,
    // so the merge's latest-wins dedup sees one giant key group — the
    // skewed CDC shape a composite key can never show (hot order keys
    // still hash-spread on the 4-column composite). The bootstrap merge
    // dedups the FULL stream; the churn merge replays a later-stamped
    // 20% slice against the existing table.
    val ev = Tables(spark, sfDir, "events")
    val users = new graft.ops.CdcTable(spark, s"$root/users", keys = Seq("user_id"))
    val evUpserts = ev.select(col("user_id"), col("ts").as("__ts"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .withColumn("__op", lit("u"))
    val nEvents = evUpserts.count()
    // the dedup operator itself, both forms, on the single-key stream:
    // agg (max_by, map-side partial reduce — what merge uses) vs the
    // pre-r16 window row_number (whole hot group in one task)
    time("dedup_agg")(graft.ops.Dedup.latestWins(
      evUpserts, Seq("user_id"), "__ts", Seq("last_type")).count())
    time("dedup_window")(graft.ops.Dedup.latestWinsWindow(
      evUpserts, Seq("user_id"), "__ts", Seq("last_type")).count())
    time("user_merge_bootstrap")(users.merge(evUpserts, "__ts"))
    val churn = evUpserts
      .filter(pmod(hash(col("user_id"), col("__ts")), lit(5)) === 0)
      .withColumn("__ts", col("__ts") + expr("INTERVAL 30 DAYS"))
      .withColumn("last_value", col("last_value") * 1.1)
    time("user_merge_churn")(users.merge(churn, "__ts"))

    val qs = timings.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"rows":$nRows,"batch_changes":$nChanges,"compacted":$compacted,""" +
      s""""hotmonth_rows":$nHotMonth,"hotkey_rows":$nHotBatch,"event_rows":$nEvents,""" +
      s""""timings":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
