package graft

import org.apache.spark.sql.functions._

import graft.ops.{CdcTable, MaterializedView}
import graft.plans.MvRewrite

/** The automatic materialized-view substitution rule
  * (`plans/MvRewrite.scala`): aggregates over a registered table's
  * current snapshot are served from the maintained view — with every
  * exactness guard (freshness, snapshot identity, null semantics,
  * distinct, non-group filters) proven to fall back to the base scan.
  */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  /** True iff the OPTIMIZED plan's scans all read the view's files (the
    * analyzed plan always shows the original table relation — the
    * substitution happens in the optimizer).
    */
  private def scansView(df: org.apache.spark.sql.DataFrame, mv: MaterializedView): Boolean = {
    val leaves = df.queryExecution.optimizedPlan.collectLeaves().collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Seq("<non-fs>")
        }
    }.flatten
    leaves.nonEmpty && leaves.forall(_.contains(mv.path))
  }

  private def fixture(name: String): (CdcTable, MaterializedView) = {
    val root = tmpDir(name)
    val t = new CdcTable(spark, s"$root/t", Seq("id"), retainVersions = 10)
    t.init(Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("a"), Some(3L)),
      (3L, Some("b"), Some(20L)), (4L, Some("b"), None),
      (5L, Some("c"), None)).toDF("id", "grp", "amt"))
    val mv = new MaterializedView(spark, t, s"$root/view", Seq("grp"), Seq("amt"), Seq("amt"))
    mv.refresh()
    MvRewrite.register(mv)
    (t, mv)
  }

  test("count/sum/avg/min/max aggregates over the table are served from the view") {
    val (t, mv) = fixture("mvrw1")
    try {
      val q = t.read.groupBy("grp").agg(
        count(lit(1)).as("n"), sum("amt").as("s"), avg("amt").as("a"),
        min("amt").as("mn"), max("amt").as("mx"))
      assert(scansView(q, mv), q.queryExecution.optimizedPlan.treeString)
      val got = q.collect().map(r => (r.getString(0),
        r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).sortBy(_._1).toSeq
      // group c is ALL-NULL in amt: sum/avg/min/max must stay NULL even
      // though the view zero-fills its sum cell
      assert(got == Seq(
        ("a", 2L, Some(13L), Some(6.5), Some(3L), Some(10L)),
        ("b", 2L, Some(20L), Some(20.0), Some(20L), Some(20L)),
        ("c", 1L, None, None, None, None)))
    } finally MvRewrite.unregister(mv)
  }

  test("rollup to a subset of group columns and the global aggregate also rewrite") {
    val (t, mv) = fixture("mvrw2")
    try {
      val g = t.read.groupBy().agg(count(lit(1)).as("n"), sum("amt").as("s"))
      assert(scansView(g, mv), g.queryExecution.optimizedPlan.treeString)
      assert(g.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5L, 33L)))
      // SELECT DISTINCT grp (Aggregate with no agg functions)
      val d = t.read.select("grp").distinct()
      assert(scansView(d, mv), d.queryExecution.optimizedPlan.treeString)
      assert(d.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"))
    } finally MvRewrite.unregister(mv)
  }

  test("group-column filters apply to the view; non-group filters fall back to the base scan") {
    val (t, mv) = fixture("mvrw3")
    try {
      val f = t.read.filter($"grp" === "a").groupBy("grp").agg(sum("amt").as("s"))
      assert(scansView(f, mv), f.queryExecution.optimizedPlan.treeString)
      assert(f.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 13L)))
      // filter on a NON-group column cannot be answered by the view
      val nf = t.read.filter($"amt" > 5L).groupBy("grp").agg(count(lit(1)).as("n"))
      assert(!scansView(nf, mv))
      assert(nf.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq ==
        Seq(("a", 1L), ("b", 1L)))
    } finally MvRewrite.unregister(mv)
  }

  test("staleness guard: an unrefreshed merge falls back to the base scan, refresh re-arms") {
    val (t, mv) = fixture("mvrw4")
    try {
      t.merge(Seq((6L, Some("a"), Some(100L), 1L, "c")).toDF("id", "grp", "amt", "ts", "__op"), "ts")
      val q1 = t.read.groupBy("grp").agg(sum("amt").as("s"))
      assert(!scansView(q1, mv), "stale view must not serve the query")
      val fresh = q1.collect().collect {
        case r if r.getString(0) == "a" => r.getLong(1)
      }.head
      assert(fresh == 113L, "fallback must read CURRENT data")
      mv.refresh()
      val q2 = t.read.groupBy("grp").agg(sum("amt").as("s"))
      assert(scansView(q2, mv), q2.queryExecution.optimizedPlan.treeString)
      assert(q2.collect().collect { case r if r.getString(0) == "a" => r.getLong(1) }.head == 113L)
    } finally MvRewrite.unregister(mv)
  }

  test("snapshot-identity guard: time travel and distinct aggregates never rewrite") {
    val (t, mv) = fixture("mvrw5")
    try {
      val v1 = t.currentVersion.get
      t.merge(Seq((7L, Some("b"), Some(1L), 1L, "c")).toDF("id", "grp", "amt", "ts", "__op"), "ts")
      mv.refresh()
      // the OLD snapshot's file set differs from current -> no rewrite
      val tt = t.readVersion(v1).groupBy("grp").agg(count(lit(1)).as("n"))
      assert(!scansView(tt, mv))
      assert(tt.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq ==
        Seq(("a", 2L), ("b", 2L), ("c", 1L)))
      // DISTINCT aggregate is not derivable from the view
      val d = t.read.groupBy("grp").agg(countDistinct("amt").as("nd"))
      assert(!scansView(d, mv))
    } finally MvRewrite.unregister(mv)
  }

  test("multiple views per table: each query is served by a view that can answer it") {
    val root = tmpDir("mvrw7")
    val t = new CdcTable(spark, s"$root/t", Seq("id"), retainVersions = 10)
    t.init(Seq(
      (1L, Some("a"), Some("x"), Some(10L)), (2L, Some("a"), Some("y"), Some(3L)),
      (3L, Some("b"), Some("x"), Some(20L))).toDF("id", "grp", "sub", "amt"))
    val byGrp = new MaterializedView(spark, t, s"$root/view_grp", Seq("grp"), Seq("amt"))
    val byGrpSub = new MaterializedView(spark, t, s"$root/view_grpsub", Seq("grp", "sub"), Seq("amt"))
    byGrp.refresh(); byGrpSub.refresh()
    MvRewrite.register(byGrp); MvRewrite.register(byGrpSub)
    try {
      // grouping by (grp, sub) is NOT derivable from the grp-only view —
      // only the finer view can serve it
      val fine = t.read.groupBy("grp", "sub").agg(sum("amt").as("s"))
      assert(scansView(fine, byGrpSub), fine.queryExecution.optimizedPlan.treeString)
      assert(fine.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq ==
        Seq(("a", "x", 10L), ("a", "y", 3L), ("b", "x", 20L)))
      // grouping by grp alone is derivable from EITHER view
      val coarse = t.read.groupBy("grp").agg(count(lit(1)).as("n"))
      assert(scansView(coarse, byGrp) || scansView(coarse, byGrpSub),
        coarse.queryExecution.optimizedPlan.treeString)
      assert(coarse.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq ==
        Seq(("a", 2L), ("b", 1L)))
    } finally { MvRewrite.unregister(byGrp); MvRewrite.unregister(byGrpSub) }
  }

  test("streaming-maintained view serves the rewrite between micro-batches") {
    import graft.cdc.CdcPipeline
    import graft.envelope.EnvelopeCodec
    val root = tmpDir("mvrw8")
    val envDir = s"$root/env"; val ckpt = s"$root/ckpt"; val tables = s"$root/tables"
    def envelopes(ids: Range, tsBase: Long) = EnvelopeCodec.synthesize(
      ids.map { i =>
        (i.toLong, new java.sql.Timestamp(tsBase + i), i.toLong % 10,
          if (i % 5 == 0) "error" else "click", i * 1.5, s"""{"k": $i}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

    // run 1: ingest with a declaratively-maintained view on event_type
    envelopes(0 until 60, 1700000000000L).write.parquet(envDir)
    val spec = CdcPipeline.ViewSpec("events", s"$root/view", Seq("event_type"), Seq("user_id"))
    new CdcPipeline(spark, envDir, ckpt, tables, Seq(spec)).runOnce()
    val t = new CdcTable(spark, s"$tables/events", Seq("event_id"))
    val mv = new MaterializedView(spark, t, s"$root/view", Seq("event_type"), Seq("user_id"))
    MvRewrite.register(mv)
    try {
      val q1 = t.read.groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(scansView(q1, mv), q1.queryExecution.optimizedPlan.treeString)
      // event_type 'error' synthesizes as a CDC DELETE (EnvelopeCodec op
      // mapping), so only the click rows land in the table
      assert(q1.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq ==
        Seq(("click", 48L)))

      // run 2: more envelopes stream in; the PIPELINE refreshes the view
      // inside its foreachBatch — the registered instance re-arms off the
      // shared pointer with no re-registration
      envelopes(60 until 100, 1800000000000L).write.mode("append").parquet(envDir)
      new CdcPipeline(spark, envDir, ckpt, tables, Seq(spec)).runOnce()
      val q2 = t.read.groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(scansView(q2, mv), q2.queryExecution.optimizedPlan.treeString)
      assert(q2.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq ==
        Seq(("click", 80L)))
    } finally MvRewrite.unregister(mv)
  }

  test("rewritten and direct results agree on a randomized table (property net)") {
    val root = tmpDir("mvrw6")
    val rnd = new scala.util.Random(42)
    val rows = (1L to 500L).map { id =>
      (id, Some(s"g${rnd.nextInt(7)}"),
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(1000).toLong))
    }
    val t = new CdcTable(spark, s"$root/t", Seq("id"), retainVersions = 10)
    t.init(rows.toDF("id", "grp", "amt"))
    val mv = new MaterializedView(spark, t, s"$root/view", Seq("grp"), Seq("amt"), Seq("amt"))
    mv.refresh()
    val direct = t.read.groupBy("grp").agg(
      count(lit(1)).as("n"), sum("amt").as("s"), avg("amt").as("a"),
      min("amt").as("mn"), max("amt").as("mx")).collect().map(_.toSeq).toSet
    MvRewrite.register(mv)
    try {
      val q = t.read.groupBy("grp").agg(
        count(lit(1)).as("n"), sum("amt").as("s"), avg("amt").as("a"),
        min("amt").as("mn"), max("amt").as("mx"))
      assert(scansView(q, mv))
      assert(q.collect().map(_.toSeq).toSet == direct)
    } finally MvRewrite.unregister(mv)
  }
}
