package graft

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** [[graft.plans.TopKViaSortLimit]]: the global-rank filter rewrite
  * installed by GraftExtensions. The shared test session carries the
  * extension, so the rule applies to any DataFrame built here.
  */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def df = spark.range(1000).select(
    $"id", (($"id" * 37) % 1000).as("x"))

  test("unpartitioned row_number <= k plans as TakeOrdered, results unchanged") {
    val ranked = df
      .withColumn("rn", row_number().over(W.orderBy($"x".desc, $"id")))
      .filter($"rn" <= 10)
    val phys = ranked.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"rewrite must bound the sort before the window:\n$phys")
    val got = ranked.orderBy($"rn").select("id", "x", "rn")
      .as[(Long, Long, Int)].collect().toSeq
    // ground truth computed without a window at all
    val want = df.orderBy($"x".desc, $"id").limit(10)
      .select("id", "x").as[(Long, Long)].collect().toSeq
      .zipWithIndex.map { case ((i, x), r) => (i, x, r + 1) }
    assert(got == want)
  }

  test("a partitioned rank filter is left alone") {
    val ranked = df
      .withColumn("grp", $"id" % 7)
      .withColumn("rn", row_number().over(W.partitionBy($"grp").orderBy($"x".desc, $"id")))
      .filter($"rn" <= 3)
    val phys = ranked.queryExecution.executedPlan.toString
    assert(!phys.contains("TakeOrderedAndProject"))
    assert(ranked.count() == 21)
  }

  test("rank filters other than row_number are left alone") {
    val ranked = df
      .withColumn("rk", rank().over(W.orderBy(($"x" % 10).desc)))
      .filter($"rk" <= 5)
    // rank() admits ties past k — a blind Limit(k) would drop rows
    val phys = ranked.queryExecution.executedPlan.toString
    assert(!phys.contains("TakeOrderedAndProject"))
    assert(ranked.count() > 5)
  }

  test("the strict and flipped comparison forms rewrite too") {
    Seq(
      df.withColumn("rn", row_number().over(W.orderBy($"x", $"id"))).filter($"rn" < 6),
      df.withColumn("rn", row_number().over(W.orderBy($"x", $"id"))).filter(lit(5) >= $"rn")
    ).foreach { q =>
      assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
      assert(q.count() == 5)
    }
  }
}
