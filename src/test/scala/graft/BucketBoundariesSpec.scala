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

  test("boundaries form plans without a global sort or window") {
    val bbPlan = SparkEntry.queries("x_bucket_boundaries")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!bbPlan.contains("Sort") && !bbPlan.contains("Window"))
  }

  test("distributed exact ntile equals the naive single-partition ntile bit-for-bit") {
    // the histogram-rank decomposition must reproduce ntile(10) OVER
    // (ORDER BY n_chars, doc_id) exactly — same buckets, same counts,
    // same min/max — on the real table; the naive form lives only here,
    // as the reference answer, never in a benched query
    Tables(spark, dir, "documents").createOrReplaceTempView("documents")
    val naive = spark.sql(
      """WITH b AS (
        |  SELECT doc_id, n_chars,
        |    CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS bucket
        |  FROM documents)
        |SELECT bucket, count(*) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM b GROUP BY bucket""".stripMargin)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val dist = SparkEntry.queries("x_ntile_bucketing")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(dist == naive)
  }
}
