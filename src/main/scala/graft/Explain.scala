package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of named queries
  * (all queries when no names given). Used to keep plans honest — filter
  * pushdown reaching the parquet scan, broadcast joins on dimension
  * tables, wide WholeStageCodegen spans, no stray shuffles.
  *
  *   sbt "runMain graft.Explain q1_pricing_summary q5_local_supplier"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_FINAL=1: execute each query first so the printed plan
    // is AQE's FINAL re-optimized plan (runtime join-strategy changes,
    // coalesced reads) instead of the initial isFinalPlan=false sketch.
    val showFinal = sys.env.get("SPARK_GRAFT_FINAL").contains("1")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      // df.count() would execute a DIFFERENT QueryExecution (an aggregate
      // over df); driving this plan's own RDD is what makes THIS df's
      // AdaptiveSparkPlanExec reach its final plan.
      if (showFinal) df.queryExecution.executedPlan.execute().count(): Unit
      df.explain("formatted")
    }
    spark.stop()
  }
}
