package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cdc.ParallelIngest
import graft.envelope.EnvelopeCodec

/** Concurrent multi-table ingest throughput — the reference's operating
  * shape (40 streaming queries on one session,
  * incremental_kafka_s3_cdc.py:456-460). For N in {1, 8, 40}: N envelope
  * streams, each carrying the SAME per-table row count (so per-table
  * cost is comparable across N), ingested by ParallelIngest over one
  * SparkSession — first a bootstrap window (CREATE + initial merge),
  * then an incremental window (updates for 1 in 5 keys). Envelope
  * fixture writes are untimed. Prints one JSON line and writes
  * ingest_bench.json:
  *
  *   {"rows_per_table":R,"runs":[{"n":N,"bootstrap_sec":…,
  *     "increment_sec":…,"tables_per_sec":…}…]}
  *
  * The 100 TB question this answers: does per-table window cost stay
  * flat as table count grows 40x on one driver (scheduling, commit
  * protocol, and listing overheads amortize), or does the driver
  * serialize? Fixture: `events` sliced by event_id % N.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rowsPerTable = sys.env.getOrElse("SPARK_GRAFT_INGEST_ROWS", "2500").toInt
    val ns = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 8, 40))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("SELECT count(*) FROM range(1000000)").collect() // warm-up

    val events = Tables(spark, sfDir, "events")
    val runs = ns.map { n =>
      val root = java.nio.file.Files.createTempDirectory(s"graft_ingest_$n").toString
      // untimed fixture: N envelope dirs, R rows each, plus the
      // incremental window (every 5th key re-arrives as an update)
      val streams = (0 until n).map { i =>
        val slice = events
          .filter(col("event_id") % n === i && col("event_id") < n.toLong * rowsPerTable)
        EnvelopeCodec.synthesize(slice).write.parquet(s"$root/env$i")
        EnvelopeCodec.synthesize(
          slice.filter(col("event_id") % 5 === 0)
            .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
            .withColumn("event_type", lit("update")))
          .write.parquet(s"$root/delta$i")
        (s"$root/env$i", s"$root/ckpt$i", s"$root/tables$i")
      }
      val ingest = new ParallelIngest(spark, maxConcurrent = math.min(n, 40))
      val t0 = System.nanoTime()
      ingest.runAllOnce(streams)
      val bootstrap = (System.nanoTime() - t0) / 1e9
      // incremental window: same checkpoints, delta dirs appended
      streams.zipWithIndex.foreach { case ((env, _, _), i) =>
        spark.read.parquet(s"$root/delta$i").write.mode("append").parquet(env)
      }
      val t1 = System.nanoTime()
      ingest.runAllOnce(streams)
      val increment = (System.nanoTime() - t1) / 1e9
      // sanity: every table holds its slice (updates merged, not dup'd)
      val counts = (0 until n).map { i =>
        new graft.ops.CdcTable(spark, s"${streams(i)._3}/events", Seq("event_id")).read.count()
      }
      require(counts.forall(c => c > 0 && c <= rowsPerTable),
        s"n=$n: unexpected table counts ${counts.take(5)}")
      Map("n" -> n.toDouble, "bootstrap_sec" -> bootstrap, "increment_sec" -> increment,
        "tables_per_sec" -> n / bootstrap)
    }
    val runsJson = runs.map(r =>
      s"""{"n":${r("n").toInt},"bootstrap_sec":${r("bootstrap_sec")},""" +
        s""""increment_sec":${r("increment_sec")},"tables_per_sec":${r("tables_per_sec")}}""")
      .mkString("[", ",", "]")
    val line = s"""{"rows_per_table":$rowsPerTable,"sf":"$sfDir","runs":$runsJson}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("ingest_bench.json"), line + "\n"): Unit
    spark.stop()
  }
}
