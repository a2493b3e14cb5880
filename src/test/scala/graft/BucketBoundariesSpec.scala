package graft

import org.apache.spark.sql.functions.col

/** Cross-validates the scale-safe equal-frequency bucketing
  * (`x_bucket_boundaries`: approx_percentile boundaries + broadcast range
  * assignment) against the exact ntile form, and pins the plan contract:
  * the boundaries form must not contain a global sort or window.
  */
class BucketBoundariesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("every decile bucket is balanced where exact ntile is balanced") {
    // exact ntile: 10 buckets, sizes n/10 +- 1 by construction
    val nt = SparkEntry.queries("x_ntile_bucketing")(spark, dir)
      .select("bucket", "n_docs").as[(Long, Long)].collect().toMap
    assert(nt.keySet == (1L to 10L).toSet)
    // boundaries form: all 10 buckets within the 10% balance contract
    val bb = SparkEntry.queries("x_bucket_boundaries")(spark, dir)
      .select("bucket", "balanced").as[(Long, Boolean)].collect().toMap
    assert(bb.keySet == (1L to 10L).toSet)
    assert(bb.values.forall(identity))
  }

  test("boundaries form plans without a global sort or window; ntile form needs one") {
    val bbPlan = SparkEntry.queries("x_bucket_boundaries")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!bbPlan.contains("Sort") && !bbPlan.contains("Window"))
    val ntPlan = SparkEntry.queries("x_ntile_bucketing")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(ntPlan.contains("Window")) // the contrast the scale path removes
  }
}
