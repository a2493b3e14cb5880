package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-level timing probe for the expensive fixture builds (currently
  * the k_analyze_ndv CdcTable) — identifies which commit/mutation inside
  * a memoized fixture builder owns the wall time, so optimization lands
  * on the right step instead of the whole builder.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.FixtureProfile"
  */
object FixtureProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.sql("SELECT count(*) FROM range(1000000)").collect()

    def step[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fixprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // ndvTable replica (ParityQueries.ndvTable steps, un-memoized)
    val root = java.nio.file.Files.createTempDirectory("graft_ndvprof").toString
    val base = Tables(spark, sfDir, "orders").select(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
    val t = new graft.ops.CdcTable(spark, s"$root/orders", keys = Seq("o_orderkey"),
      partitionSource = Some("o_orderdate"),
      ndvColumns = Seq("o_custkey", "o_orderpriority", "o_orderstatus"))
    step("ndv.init")(t.init(base.filter(col("o_orderkey") % 3 =!= 0)))
    step("ndv.append")(t.append(base.filter(col("o_orderkey") % 3 === 0)))
    step("ndv.delete.cow")(t.delete(col("o_custkey") % 7 === 0 &&
      col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))))
    step("ndv.deleteVectored")(t.deleteVectored(col("o_orderkey") % 11 === 2 &&
      col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))))
    step("ndv.analyze")(t.analyze().count(): Unit)
    step("ndv.analyze.rep2")(t.analyze().count(): Unit)

    // starView replica (ParityQueries.starView steps, un-memoized)
    locally {
      import graft.ops.{CdcTable, JoinView}
      val sroot = java.nio.file.Files.createTempDirectory("graft_starprof").toString
      val li = Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_shipdate")
      val part = Tables(spark, sfDir, "part").select("p_partkey", "p_name", "p_retailprice")
      val supp = Tables(spark, sfDir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
      val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      val onP = Seq("l_partkey" -> "p_partkey")
      val onS = Seq("l_suppkey" -> "s_suppkey")
      val fact = new CdcTable(spark, s"$sroot/fact", keys,
        partitionSource = Some("l_shipdate"), retainVersions = 5)
      val dimP = new CdcTable(spark, s"$sroot/part", Seq("p_partkey"), retainVersions = 5)
      val dimS = new CdcTable(spark, s"$sroot/supp", Seq("s_suppkey"), retainVersions = 5)
      val view = new CdcTable(spark, s"$sroot/view", keys, retainVersions = 5)
      step("star.fact.init")(fact.init(li))
      step("star.dims.init") { dimP.init(part); dimS.init(supp) }
      step("star.view.init")(view.init(
        JoinView.computeStar(fact.read, Seq(dimP.read -> onP, dimS.read -> onS))
          .withColumn(JoinView.TsCol, lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00")))))
      val (f0, p0, s0) =
        (fact.currentVersion.get, dimP.currentVersion.get, dimS.currentVersion.get)
      val ts2 = lit(java.sql.Timestamp.valueOf("2001-01-02 00:00:00"))
      val slot = (col("l_orderkey") + col("l_linenumber")) % 10
      val inWin =
        col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-03-01 00:00:00"))
      step("star.fact.merge")(fact.merge(li.filter(slot < 5 && inWin)
        .withColumn("l_extendedprice", col("l_extendedprice") * 1.1)
        .withColumn("__op", lit("u"))
        .unionByName(li.filter(slot >= 5 && slot < 7 && inWin).withColumn("__op", lit("d")))
        .withColumn("f_ts", ts2), "f_ts"))
      step("star.dimP.merge")(dimP.merge(
        part.filter(col("p_partkey") % 11 === 0).withColumn("__op", lit("d"))
          .unionByName(part.filter(col("p_partkey") % 11 =!= 0 && col("p_partkey") % 3 === 0)
            .withColumn("p_retailprice", col("p_retailprice") * 1.1)
            .withColumn("__op", lit("u")))
          .withColumn("p_ts", ts2), "p_ts"))
      step("star.dimS.merge")(dimS.merge(supp.filter(col("s_suppkey") % 4 === 0)
        .withColumn("s_acctbal", col("s_acctbal") * 2)
        .withColumn("__op", lit("u")).withColumn("s_ts", ts2), "s_ts"))
      val (f1, p1, s1) =
        (fact.currentVersion.get, dimP.currentVersion.get, dimS.currentVersion.get)
      step("star.changes.fact")(fact.changesBetween(f0, f1).count(): Unit)
      step("star.changes.dimP")(dimP.changesBetween(p0, p1).count(): Unit)
      step("star.changes.dimS")(dimS.changesBetween(s0, s1).count(): Unit)
      val batch = step("star.starBatch.plan")(JoinView.starBatch(
        fact.changesBetween(f0, f1), preds => fact.readWhereAt(f1, preds),
        Seq(JoinView.Dim(dimP.changesBetween(p0, p1),
          preds => dimP.readWhereAt(p1, preds), onP),
          JoinView.Dim(dimS.changesBetween(s0, s1),
            preds => dimS.readWhereAt(s1, preds), onS)),
        keys)
        .withColumn(JoinView.TsCol, lit(java.sql.Timestamp.valueOf("2001-01-03 00:00:00"))))
      val ck = step("star.starBatch.eval")(batch.localCheckpoint())
      step("star.view.merge")(view.merge(ck, JoinView.TsCol))
      step("star.read")(view.read.count(): Unit)
    }

    spark.stop()
  }
}
