package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what `plans.BandJoinViaBuckets` buys: the same two-sided
  * band-join SQL (events within 1 hour after each error, same user)
  * with the rule ON vs EXCLUDED (`spark.sql.optimizer.excludedRules`),
  * at SPARK_GRAFT_SF_DIR. The excluded plan hashes only on user_id and
  * materializes every same-user pair before the band filter
  * (~density² per key); the rewritten plan adds the hour-bucket to the
  * join key. Prints one line per mode: wall seconds (best of 3) and
  * result row count (must match).
  */
object BandBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables(spark, sfDir, "events")
    // two key granularities: the natural one (sf0.1: ~670 events/key —
    // low density, where the native hash join's post-filter pairs are
    // cheap) and a coarse one (user_id % 10: ~10k events/key — the
    // density regime a coarser key or a bigger corpus puts every join
    // in, where per-key pairs grow quadratically)
    ev.createOrReplaceTempView("events")
    ev.withColumn("user_id", col("user_id") % 10).createOrReplaceTempView("events_dense")
    def q(table: String) =
      s"""SELECT a.event_id, count(*) AS n
         |FROM $table a JOIN $table p
         |  ON a.user_id = p.user_id
         |  AND p.ts > a.ts AND p.ts <= a.ts + INTERVAL 1 HOUR
         |WHERE a.event_type = 'error'
         |GROUP BY a.event_id""".stripMargin
    spark.sql("SELECT count(*) FROM range(1000000)").collect()
    for (table <- Seq("events", "events_dense");
         (label, excluded) <- Seq(
           ("bucketized (rule on)", ""),
           ("native band (rule excluded)", "graft.plans.BandJoinViaBuckets"))) {
      spark.conf.set("spark.sql.optimizer.excludedRules", excluded)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = spark.sql(q(table)).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$table%-14s $label%-30s best=${times.map(_._1).min}%7.2f s  rows=${times.head._2}")
    }
    spark.stop()
  }
}
