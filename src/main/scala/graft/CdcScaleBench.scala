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

    val qs = timings.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"rows":$nRows,"batch_changes":$nChanges,"compacted":$compacted,"timings":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
