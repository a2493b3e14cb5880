package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Adaptive-execution skew handling: the runtime complement to the
  * manual `ops.Salting` rewrite. With AQE's skew thresholds lowered to
  * test scale, a join whose big side concentrates ~90% of rows on one
  * key must be split by OptimizeSkewedJoin (the physical sort-merge join
  * reports `isSkew=true`), and the result must equal the non-adaptive
  * join exactly. At 100 TB this is the default defense for skew the
  * planner cannot see coming; Salting remains for the cases AQE cannot
  * touch (aggregations, broadcast-ineligible shapes).
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join and preserves the exact result") {
    // ISOLATED session: suites run in parallel over one shared
    // SparkContext, and these conf mutations (AQE coalescing, 8KB
    // advisory partitions, broadcast off) would change the FILE COUNTS
    // other suites' compactions produce mid-flight. newSession() forks
    // the SQLConf while sharing the context — mutations stay local.
    val spark = this.spark.newSession()
    import spark.implicits._
    val conf = spark.conf
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    // force a sort-merge join: broadcast would dodge the skew entirely
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    locally {
      // ~90% of the big side lands on key 7
      val big = spark.range(0, 200000)
        .select(when($"id" % 10 < 9, 7L).otherwise($"id" % 100).as("k"),
          ($"id" * 3).as("payload"))
        .hint("shuffle_merge")
      val small = spark.range(0, 100)
        .select($"id".as("k"), ($"id" % 5).as("dim"))
      // inspect the SAME dataset that executes — a derived .as[...] would
      // carry its own, never-executed plan
      val joined = big.join(small, "k").agg(
        count(lit(1)).as("n"), sum($"payload").as("s"))
        .as[(Long, Long)]
      val Seq((n, s)) = joined.collect().toSeq

      // the adaptive plan actually split the skewed partition
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "expected an adaptive plan")
      // the skew-handled side reads as "AQEShuffleRead skewed" (or
      // "coalesced and skewed") in the final adaptive plan
      assert(adaptive.get.executedPlan.toString.contains("skewed"),
        s"expected OptimizeSkewedJoin to split the hot key:\n${adaptive.get.executedPlan}")

      // exact result parity with AQE off
      conf.set("spark.sql.adaptive.enabled", "false")
      val Seq((n2, s2)) = big.join(small, "k")
        .agg(count(lit(1)).as("n"), sum($"payload").as("s"))
        .as[(Long, Long)].collect().toSeq
      assert((n, s) == (n2, s2))
    }
  }
}
