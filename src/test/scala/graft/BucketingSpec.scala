package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketing: the co-located join path for 100 TB — both sides bucketed
  * on the join key join WITHOUT a shuffle exchange. This is the engine's
  * answer to "big fact-fact joins shuffle on their keys" (builder brief):
  * pre-bucket once, join many times shuffle-free.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-bucketed equi-join plans without a shuffle exchange") {
    // isolated session (suites run in parallel over one SparkContext):
    // disabling broadcast on the SHARED conf would flip join strategies
    // under other suites' plan assertions mid-flight
    val spark = this.spark.newSession()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.range(0, 10000).select($"id", ($"id" % 97).as("va"))
        .write.bucketBy(8, "id").sortBy("id").saveAsTable("graft_bucket_a")
      spark.range(0, 10000).select($"id", ($"id" % 89).as("vb"))
        .write.bucketBy(8, "id").sortBy("id").saveAsTable("graft_bucket_b")

      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "id")
      assert(joined.count() == 10000) // execute first so AQE finalizes
      val inner = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = inner.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, got:\n${inner.toString}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("bucket PRUNING: an equality filter on the bucket key reads 1 of 8 buckets") {
    // the read-side payoff of bucketing beyond join co-location: a point
    // predicate on the bucket key hashes to its bucket and the scan
    // opens ONLY that bucket's files — at 100 TB, 7/8 of the table is
    // never listed, fetched, or decoded
    val spark = this.spark.newSession()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_bucket_p")
    // auto-bucketed-scan turns bucketed reads OFF for scan-only queries
    // (no join/agg to co-locate) — which also forfeits bucket pruning;
    // pin it on in this isolated session so the point read can prune
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      spark.range(0, 10000).select($"id", ($"id" % 97).as("v"))
        .write.bucketBy(8, "id").saveAsTable("graft_bucket_p")
      val q = spark.table("graft_bucket_p").filter($"id" === 4242L)
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"point read must prune to one bucket:\n$scan")
      assert(q.collect().map(_.getLong(1)).toSeq == Seq(4242L % 97))
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucket_p")
  }
}
