package graft

import graft.ops.CdcTable
import org.apache.spark.sql.functions._

/** Write-audit-publish branching: a branch stages commits invisibly, the
  * audit reads them, publish fast-forwards the parent atomically (or
  * conflicts if the parent moved), and a rejected branch drops without a
  * trace — on both table layouts.
  */
class WapSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def state(t: CdcTable): Set[(Long, String)] =
    t.read.select("id", "v").as[(Long, String)].collect().toSet

  test("wap: branch stages invisibly, publish lands atomically as one PUBLISH version") {
    val t = new CdcTable(spark, tmpDir("wap") + "/t", Seq("id"))
    t.init(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))
    val v0 = t.currentVersion.get

    val b = t.createBranch("audit")
    assert(t.branches == Seq("audit"))
    b.merge(Seq((2L, "b2", 2L, "u"), (3L, "c", 2L, "c"), (1L, null.asInstanceOf[String], 2L, "d"))
      .toDF("id", "v", "ts", "__op"), "ts")

    // WRITE done: branch sees the batch, parent does not
    assert(state(b) == Set((2L, "b2"), (3L, "c")))
    assert(state(t) == Set((1L, "a"), (2L, "b")), "staged writes leaked to the parent")
    assert(t.currentVersion.contains(v0))

    // AUDIT passes -> PUBLISH: one new parent version, branch gone
    t.publish("audit")
    assert(state(t) == Set((2L, "b2"), (3L, "c")))
    assert(t.currentVersion.contains(v0 + 1))
    assert(t.branches.isEmpty)
    val headOp = t.history.select("operation").head().getString(0)
    assert(headOp == "PUBLISH", s"head op was $headOp")
    // and it undoes like any commit
    t.restore(v0)
    assert(state(t) == Set((1L, "a"), (2L, "b")))
  }

  test("wap: rejected branch drops without a trace; empty branch publishes as no-op") {
    val t = new CdcTable(spark, tmpDir("wapdrop") + "/t", Seq("id"))
    t.init(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))
    val v0 = t.currentVersion.get

    val b = t.createBranch("bad")
    b.merge(Seq((1L, "corrupt", 2L, "u")).toDF("id", "v", "ts", "__op"), "ts")
    t.dropBranch("bad")
    assert(t.branches.isEmpty && state(t) == Set((1L, "a")))
    assert(t.currentVersion.contains(v0), "drop must not commit anything")

    // a branch the audit never wrote to: publish burns no version
    t.createBranch("noop")
    t.publish("noop")
    assert(t.currentVersion.contains(v0) && t.branches.isEmpty)

    // a constraint-ONLY audit (no data commits) still carries its CHECK
    // to the parent through the no-op publish path — the invariant the
    // auditor declared must not vanish with the branch
    val c = t.createBranch("consonly")
    c.addConstraint("v_nonempty", "length(v) > 0")
    t.publish("consonly")
    assert(t.currentVersion.contains(v0), "constraint-only publish burns no version")
    assert(t.constraints.map(_._1).contains("v_nonempty"))
    assert(t.branches.isEmpty)
  }

  test("wap: publish conflicts when the parent moved past the fork") {
    val t = new CdcTable(spark, tmpDir("wapconf") + "/t", Seq("id"))
    t.init(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))
    val b = t.createBranch("stale")
    b.merge(Seq((2L, "staged", 2L, "c")).toDF("id", "v", "ts", "__op"), "ts")
    // parent commits independently after the fork
    t.merge(Seq((3L, "mainline", 2L, "c")).toDF("id", "v", "ts", "__op"), "ts")

    intercept[CdcTable.PublishConflictException] { t.publish("stale") }
    // failed publish leaves both sides intact: re-branch-and-replay works
    assert(t.branches == Seq("stale"))
    assert(state(t) == Set((1L, "a"), (3L, "mainline")))
    t.dropBranch("stale")
    val b2 = t.createBranch("replay")
    b2.merge(Seq((2L, "staged", 2L, "c")).toDF("id", "v", "ts", "__op"), "ts")
    t.publish("replay")
    assert(state(t) == Set((1L, "a"), (2L, "staged"), (3L, "mainline")))
  }

  test("wap: partitioned table — only the staged month churns, time travel crosses publish") {
    val t = new CdcTable(spark, tmpDir("wappart") + "/t", Seq("id"),
      partitionSource = Some("created"))
    t.init(Seq(
      (1L, "jan", ts("2001-01-05 00:00:00")),
      (2L, "feb", ts("2001-02-05 00:00:00"))).toDF("id", "v", "created"))
    val v0 = t.currentVersion.get

    val b = t.createBranch("audit")
    b.merge(Seq((2L, "feb2", ts("2001-02-05 00:00:00"), 2L, "u"))
      .toDF("id", "v", "created", "mts", "__op"), "mts")
    assert(state(t) == Set((1L, "jan"), (2L, "feb")))

    t.publish("audit")
    assert(state(t) == Set((1L, "jan"), (2L, "feb2")))
    assert(t.currentVersion.contains(v0 + 1))
    // pre-publish version still reads within retention
    assert(t.readVersion(v0).select("id", "v").as[(Long, String)].collect().toSet ==
      Set((1L, "jan"), (2L, "feb")))
  }

  test("wap: statement face — CREATE/SHOW/PUBLISH/DROP BRANCH round-trip") {
    import graft.ops.Dml
    val root = tmpDir("wapsql")
    val path = (n: String) => s"$root/$n"
    val t = new CdcTable(spark, path("t"), Seq("id"))
    t.init(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))

    Dml.execute(spark, "ALTER TABLE t CREATE BRANCH audit", path, Seq("id"))
    t.branch("audit").merge(
      Seq((2L, "staged", 2L, "c")).toDF("id", "v", "ts", "__op"), "ts")
    val shown = Dml.query(spark, "SHOW BRANCHES t", path, Seq("id"))
      .as[(String, Long, Long)].collect().toSeq
    assert(shown == Seq(("audit", 1L, 2L)), s"got $shown")

    Dml.execute(spark, "ALTER TABLE t PUBLISH BRANCH audit", path, Seq("id"))
    assert(state(t) == Set((1L, "a"), (2L, "staged")))
    assert(Dml.query(spark, "SHOW BRANCHES t", path, Seq("id")).isEmpty)

    Dml.execute(spark, "ALTER TABLE t CREATE BRANCH bad", path, Seq("id"))
    Dml.execute(spark, "ALTER TABLE t DROP BRANCH bad", path, Seq("id"))
    assert(t.branches.isEmpty)
    // reads reject on the write entry point and vice versa
    intercept[IllegalArgumentException] {
      Dml.execute(spark, "SHOW BRANCHES t", path, Seq("id"))
    }
  }

  test("wap: audit-added CHECK constraint carries to the parent on publish") {
    val t = new CdcTable(spark, tmpDir("wapcons") + "/t", Seq("id"))
    t.init(Seq((1L, 10L, 1L)).toDF("id", "qty", "ts"))
    val b = t.createBranch("audit")
    b.merge(Seq((2L, 20L, 2L, "c")).toDF("id", "qty", "ts", "__op"), "ts")
    b.addConstraint("qty_positive", "qty > 0")
    t.publish("audit")
    assert(t.constraints.map(_._1).contains("qty_positive"))
    intercept[CdcTable.ConstraintViolationException] {
      t.merge(Seq((3L, -5L, 3L, "c")).toDF("id", "qty", "ts", "__op"), "ts")
    }
  }

  test("wap: full lifecycle on object-store IO semantics, vectored delete staged on the branch") {
    import graft.ops.ObjectStoreSimTableIO
    val io = new ObjectStoreSimTableIO
    val t = new CdcTable(spark, tmpDir("wapstore") + "/t", Seq("id"), io = io)
    t.init(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("id", "v", "ts"))
    val v0 = t.currentVersion.get

    val b = t.createBranch("audit")
    b.merge(Seq((4L, "d", 2L, "c")).toDF("id", "v", "ts", "__op"), "ts")
    // merge-on-read delete staged on the branch: the vector must carry
    // through publish's state linking, not just the data files
    b.deleteVectored(col("v") === "b")
    assert(state(t) == Set((1L, "a"), (2L, "b"), (3L, "c")))

    t.publish("audit")
    assert(state(t) == Set((1L, "a"), (3L, "c"), (4L, "d")))
    assert(t.currentVersion.contains(v0 + 1) && t.branches.isEmpty)
    // the published vector keeps metadata counts exact on the parent
    assert(t.countWhere(Nil) == 3L)
  }

  test("wap: publishRebased replays the staged delta onto a moved parent") {
    val t = new CdcTable(spark, tmpDir("waprebase") + "/t", Seq("id"), retainVersions = 5)
    t.init(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("id", "v", "ts"))

    val b = t.createBranch("stage")
    // staged over FOUR commits — more than the parent's retainVersions,
    // so the branch's unbounded retention is what keeps the fork state
    // (branch v1) alive for the fork→head diff
    b.merge(Seq((2L, "b-branch", 2L, "u")).toDF("id", "v", "ts", "__op"), "ts")
    b.merge(Seq((3L, "c", 2L, "d")).toDF("id", "v", "ts", "__op"), "ts")
    b.merge(Seq((4L, "d-wrong", 2L, "c")).toDF("id", "v", "ts", "__op"), "ts")
    b.merge(Seq((4L, "d-branch", 3L, "u")).toDF("id", "v", "ts", "__op"), "ts")
    // parent moves past the fork: updates an untouched key and inserts 5
    t.merge(Seq((1L, "a-main", 3L, "u"), (5L, "e-main", 3L, "c"))
      .toDF("id", "v", "ts", "__op"), "ts")
    intercept[CdcTable.PublishConflictException] { t.publish("stage") }

    t.publishRebased("stage", "ts")
    // parent's post-fork work survives; staged delta applies on top
    assert(state(t) == Set((1L, "a-main"), (2L, "b-branch"), (4L, "d-branch"), (5L, "e-main")))
    assert(t.branches.isEmpty)

    // unmoved parent: rebase degrades to the plain fast-forward publish
    val b2 = t.createBranch("ff")
    b2.merge(Seq((6L, "f", 4L, "c")).toDF("id", "v", "ts", "__op"), "ts")
    t.publishRebased("ff", "ts")
    assert(state(t).contains((6L, "f")))
    assert(t.history.select("operation").head().getString(0) == "PUBLISH")
  }
}
