package graft

import org.apache.spark.sql.functions._
import graft.ops.{CdcMerge, Dedup}

class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "alice", 100.0),
    (2L, "bob", 200.0),
    (3L, "carol", 300.0)
  ).toDF("id", "name", "amount")

  test("matched update replaces, matched delete drops, unmatched inserts") {
    val batch = Seq(
      (2L, "bob2", 250.0, "u"),
      (3L, null.asInstanceOf[String], 0.0, "d"),
      (4L, "dave", 400.0, "c")
    ).toDF("id", "name", "amount", "__op")
    val out = CdcMerge.merge(base, batch, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "alice", 100.0), (2L, "bob2", 250.0), (4L, "dave", 400.0)))
  }

  test("not-matched delete never inserts") {
    val batch = Seq((9L, "ghost", 0.0, "d")).toDF("id", "name", "amount", "__op")
    assert(CdcMerge.merge(base, batch, Seq("id")).count() == 3)
  }

  test("merge is idempotent") {
    val batch = Seq((2L, "bob2", 250.0, "u"), (4L, "dave", 400.0, "c"))
      .toDF("id", "name", "amount", "__op")
    val once = CdcMerge.merge(base, batch, Seq("id"))
    val twice = CdcMerge.merge(once, batch, Seq("id"))
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("schema evolution: new batch column appears, old rows backfilled null") {
    val batch = Seq((2L, "bob2", 250.0, "x@y.z", "u"))
      .toDF("id", "name", "amount", "email", "__op")
    val out = CdcMerge.merge(base, batch, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "name", "amount", "email"))
    val byId = out.collect().map(r => r.getLong(0) -> r.getAs[String]("email")).toMap
    assert(byId(2L) == "x@y.z" && byId(1L) == null)
  }

  test("batch missing a sink column leaves null on updated rows (soft drop)") {
    val batch = Seq((1L, "alice2", "u")).toDF("id", "name", "__op")
    val out = CdcMerge.merge(base, batch, Seq("id"))
    val r1 = out.filter($"id" === 1L).head()
    assert(r1.getAs[String]("name") == "alice2" && r1.isNullAt(r1.fieldIndex("amount")))
  }

  test("latest-wins dedup has a total order on (ts, tie)") {
    val events = Seq(
      (1L, "first", 10L, 1L), (1L, "late", 20L, 2L), (1L, "tie", 20L, 3L)
    ).toDF("id", "v", "ts", "seq")
    val out = Dedup.latestWins(events, Seq("id"), "ts", Seq("seq"))
    assert(out.select("v").as[String].collect().toSeq == Seq("tie"))
  }

  test("latest-wins agg form equals the window form, incl. null payloads and map columns") {
    val events = Seq(
      (1L, Option("a"), Map("k" -> 1), 10L, 1L),
      (1L, None, Map("k" -> 2), 20L, 2L),
      (2L, Option("only"), Map.empty[String, Int], 5L, 1L),
      (3L, Option("x"), Map("z" -> 9), 7L, 2L),
      (3L, Option("y"), Map("z" -> 8), 7L, 1L) // ts tie broken by seq
    ).toDF("id", "v", "props", "ts", "seq")
    val agg = Dedup.latestWins(events, Seq("id"), "ts", Seq("seq"))
    val win = Dedup.latestWinsWindow(events, Seq("id"), "ts", Seq("seq"))
    assert(agg.columns.toSeq == events.columns.toSeq)
    assert(agg.orderBy("id").collect().toSeq == win.orderBy("id").collect().toSeq)
    // the winner carries its OWN null payload (not backfilled from a loser)
    val r1 = agg.filter($"id" === 1L).head()
    assert(r1.isNullAt(r1.fieldIndex("v")) && r1.getMap[String, Int](2)("k") == 2)
  }

  test("latest-wins plans as a partial-combinable aggregate, not a window") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val events = spark.range(0, 1000)
      .select(($"id" % 10).as("id"), $"id".as("ts"), concat(lit("v"), $"id").as("v"))
    val out = Dedup.latestWins(events, Seq("id"), "ts")
    out.count() // materialize so AQE finalizes the physical plan
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => unwrap(q.plan)
      case other => other
    }
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val u = unwrap(p)
      u +: u.children.flatMap(nodes)
    }
    val all = nodes(out.queryExecution.executedPlan)
    assert(!all.exists(_.isInstanceOf[WindowExec]),
      "hot-key dedup must not concentrate a key group in one window task")
    // two aggregate stages (partial below the exchange, final above) —
    // the map-side combine that makes hot-key batches shrink pre-shuffle
    val aggs = all.count {
      case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
      case _ => false
    }
    assert(aggs >= 2,
      s"expected partial+final aggregate stages, saw $aggs in:\n${out.queryExecution.executedPlan}")
  }

  test("full-image batch merges via broadcast anti join (no full-outer shuffle of the table)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val big = spark.range(0, 50000)
      .select($"id", concat(lit("n"), $"id").as("name"), ($"id" * 1.5).as("amount"))
    val batch = Seq((1L, "upd", 9.9, "u"), (99999L, "new", 1.0, "c"), (2L, null.asInstanceOf[String], 0.0, "d"))
      .toDF("id", "name", "amount", "__op")
    val merged = CdcMerge.merge(big, batch, Seq("id"))
    assert(merged.count() == 50000) // -1 delete +1 insert
    val inner = merged.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val antiBroadcast = inner.collect {
      case b: BroadcastHashJoinExec if b.joinType.sql == "LEFT ANTI" => b
    }
    assert(antiBroadcast.nonEmpty, s"expected broadcast anti join, got:\n$inner")
    val r1 = merged.filter($"id" === 1L).head()
    assert(r1.getAs[String]("name") == "upd" && merged.filter($"id" === 2L).count() == 0)
  }

  test("applyCdcBatch composes dedup + merge (last state per key wins)") {
    val raw = Seq(
      (2L, "v1", 900.0, 1L, "u"),
      (2L, "v2", 950.0, 2L, "u"),
      (3L, "x", 0.0, 3L, "d"),
      (5L, "new", 500.0, 4L, "c")
    ).toDF("id", "name", "amount", "ts", "__op")
    val out = CdcMerge.applyCdcBatch(
      base.withColumn("ts", lit(0L)), raw, Seq("id"), "ts")
      .orderBy("id")
    assert(out.select("id", "name").as[(Long, String)].collect().toSeq ==
      Seq((1L, "alice"), (2L, "v2"), (5L, "new")))
  }

  test("mergeGuarded ignores late cross-batch events; current ones apply") {
    val stored = Seq(
      (1L, "a5", Some(5L)), (2L, "b5", Some(5L)), (3L, "c5", Some(5L)), (4L, "d5", Some(5L)),
      (7L, "g", None),      // null stored ts, untouched -> must survive
      (8L, "h", None))      // null stored ts, updated -> yields to the update
      .toDF("id", "name", "ts")
    val lateBatch = Seq(
      (1L, "a3", 3L, "u"),  // late update -> ignored
      (2L, "x", 3L, "d"),   // late delete -> ignored
      (3L, "c7", 7L, "u"),  // current update -> applied
      (4L, "y", 7L, "d"),   // current delete -> removed
      (5L, "e7", 7L, "c"),  // insert -> applied
      (6L, "z", 7L, "d"),   // unmatched delete -> never inserts
      (8L, "h7", 7L, "u")   // update over null stored ts -> applied
    ).toDF("id", "name", "ts", "__op")

    val out = CdcMerge.mergeGuarded(stored, lateBatch, Seq("id"), "ts")
      .orderBy("id").select("id", "name").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a5"), (2L, "b5"), (3L, "c7"), (5L, "e7"), (7L, "g"), (8L, "h7")))

    // plain merge (no guard) would have let the late rows win
    val unguarded = CdcMerge.merge(stored, lateBatch, Seq("id"))
      .orderBy("id").select("id", "name").as[(Long, String)].collect().toSeq
    assert(unguarded == Seq((1L, "a3"), (3L, "c7"), (5L, "e7"), (7L, "g"), (8L, "h7")))
  }
}
