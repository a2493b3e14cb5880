package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Merge-on-read vs copy-on-write DELETE at scale: time and BYTES WRITTEN
  * for a small predicate delete (100-ish rows) against an orders table —
  * the case deletion vectors exist for (GDPR erasure, bad-record
  * retraction at 100 TB). The copy-on-write path rewrites every file
  * holding a match (unpartitioned: the whole table); the vectored path
  * writes a kilobyte parquet + metadata. BASELINE.md records the numbers.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.DvBench /root/testdata/sf1 /tmp/dvbench"
  */
object DvBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val root = args.lift(1).getOrElse("/tmp/dvbench")
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

    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

    // version-dir bytes EXCLUDING hard-link carry-over (a linked file
    // shares its inode; count only names not present in the prior dir)
    def freshBytes(prev: java.io.File, next: java.io.File): Long = {
      def names(d: java.io.File): Set[String] =
        Option(d.listFiles()).getOrElse(Array.empty).filter(_.isFile).map(_.getName).toSet
      val carried = names(prev)
      Option(next.listFiles()).getOrElse(Array.empty)
        .map(f => if (f.isDirectory) dirBytes(f)
                  else if (carried.contains(f.getName)) 0L else f.length()).sum
    }

    val orders = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderstatus")
    val n = orders.count()

    def mk(name: String): graft.ops.CdcTable = {
      val t = new graft.ops.CdcTable(spark, s"$root/$name", Seq("o_orderkey"))
      t.init(orders.repartitionByRange(64, col("o_orderkey")))
      t
    }
    def vdir(t: graft.ops.CdcTable, v: Long) =
      new java.io.File(t.path, f"v$v%08d")

    val pred = col("o_orderkey") % 14723L === 11L // ~100 rows at sf1

    val cow = mk("cow")
    val t0 = System.nanoTime()
    cow.delete(pred)
    val cowSec = (System.nanoTime() - t0) / 1e9
    val cowBytes = freshBytes(vdir(cow, 1), vdir(cow, 2))

    val mor = mk("mor")
    val t1 = System.nanoTime()
    mor.deleteVectored(pred)
    val morSec = (System.nanoTime() - t1) / 1e9
    // the vector lives under path/dv/vNNNNNNNN — count it as the commit's
    // fresh bytes (the data dir itself is all hard links)
    val morBytes = freshBytes(vdir(mor, 1), vdir(mor, 2)) +
      dirBytes(new java.io.File(mor.path, "dv/v00000002"))

    val same = mor.read.count() == cow.read.count()

    // ---- partitioned retention: CoW month delete vs metadata-only drop --
    // the log-retention shape: every month before the cutoff leaves the
    // table. The predicate delete scans + rewrites; dropMonths edits the
    // manifest.
    def mkPart(name: String): graft.ops.CdcTable = {
      val t = new graft.ops.CdcTable(spark, s"$root/$name", Seq("o_orderkey"),
        partitionSource = Some("o_orderdate"))
      t.init(orders)
      t
    }
    val cutoff = "1998-01"
    val cowP = mkPart("cow_part")
    val t2 = System.nanoTime()
    cowP.delete(col("o_orderdate") < lit(java.sql.Timestamp.valueOf(s"$cutoff-01 00:00:00")))
    val cowTtlSec = (System.nanoTime() - t2) / 1e9
    val ttlP = mkPart("ttl_part")
    val t3 = System.nanoTime()
    ttlP.retainMonthsFrom(cutoff): Unit
    val ttlSec = (System.nanoTime() - t3) / 1e9
    val ttlSame = ttlP.read.count() == cowP.read.count()

    println(s"""{"bench":"dv_delete","sf":"$sfDir","rows":$n,""" +
      s""""cow_sec":$cowSec,"cow_bytes":$cowBytes,""" +
      s""""mor_sec":$morSec,"mor_bytes":$morBytes,"counts_match":$same,""" +
      s""""ttl_cow_sec":$cowTtlSec,"ttl_meta_sec":$ttlSec,"ttl_match":$ttlSame}""")
    spark.stop()
  }
}
