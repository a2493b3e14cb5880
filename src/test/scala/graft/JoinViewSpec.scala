package graft

import org.apache.spark.sql.functions._
import graft.ops.{CdcTable, JoinView}

/** Incremental join-view maintenance ([[graft.ops.JoinView]]): the
  * delta-refreshed `fact JOIN dim` view must equal the full recompute
  * after every window, across fact updates/deletes/inserts, dimension
  * updates/deletes, foreign-key moves, and same-window combinations of
  * all of them. Each table merges under its OWN ts column name (f_ts /
  * d_ts) — the payload-disjointness contract real enrichment joins
  * satisfy by projection.
  */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def dt(s: String) = java.sql.Date.valueOf(s)
  private def ts(n: Int) = java.sql.Timestamp.valueOf(f"2000-01-$n%02d 00:00:00")
  private val on = Seq("fk" -> "k")

  private def fixture(root: String): (CdcTable, CdcTable, CdcTable) = {
    val fact = new CdcTable(spark, s"$root/fact", Seq("id"),
      partitionSource = Some("day"), retainVersions = 10)
    val dim = new CdcTable(spark, s"$root/dim", Seq("k"), retainVersions = 10)
    val view = new CdcTable(spark, s"$root/view", Seq("id"), retainVersions = 10)
    fact.init(Seq(
      (1L, 10L, 5.0, dt("1996-01-10")),
      (2L, 20L, 6.0, dt("1996-02-10")),
      (3L, 30L, 7.0, dt("1996-03-10")),
      (4L, 99L, 8.0, dt("1996-01-20")) // dangling fk: never in the view
    ).toDF("id", "fk", "amount", "day"))
    dim.init(Seq((10L, "a", 1L), (20L, "b", 2L), (30L, "c", 3L))
      .toDF("k", "name", "rating"))
    view.init(JoinView.compute(fact.read, dim.read, on)
      .withColumn(JoinView.TsCol, lit(ts(1))))
    (fact, dim, view)
  }

  /** The view (minus its refresh ts) must equal the fresh inner join,
    * compared on the recompute's columns sorted by name — the view may
    * have acquired them in merge order.
    */
  private def assertViewCurrent(view: CdcTable, fact: CdcTable, dim: CdcTable): Unit = {
    val want0 = JoinView.compute(fact.read, dim.read, on)
    val cols = want0.columns.sorted.toSeq
    val got = view.read.drop(JoinView.TsCol).select(cols.map(col): _*)
      .orderBy("id").collect().toSeq
    val want = want0.select(cols.map(col): _*).orderBy("id").collect().toSeq
    assert(got == want, s"view diverged from recompute:\n got $got\nwant $want")
  }

  test("bootstrap equals the plain inner join; dangling foreign keys are absent") {
    val (fact, dim, view) = fixture(tmpDir("jv1"))
    assertViewCurrent(view, fact, dim)
    assert(view.read.filter(col("id") === 4L).count() == 0)
  }

  test("one refresh covers fact update/delete/insert/fk-move and dim update/delete at once") {
    val (fact, dim, view) = fixture(tmpDir("jv2"))
    val (fa0, db0) = (fact.currentVersion.get, dim.currentVersion.get)
    fact.merge(Seq(
      (1L, 10L, 50.0, dt("1996-01-10"), ts(2), "u"), // payload update, partner kept
      (2L, 30L, 6.0, dt("1996-02-10"), ts(2), "u"),  // fk move 20 -> 30 (30 dies below)
      (3L, 30L, 7.0, dt("1996-03-10"), ts(2), "d"),  // fact delete
      (5L, 20L, 9.0, dt("1996-04-05"), ts(2), "c")   // insert -> partner 20 (updated below)
    ).toDF("id", "fk", "amount", "day", "f_ts", "__op"), "f_ts")
    dim.merge(Seq(
      (20L, "b2", 2L, ts(2), "u"), // dim payload update
      (30L, "c", 3L, ts(2), "d")   // dim delete
    ).toDF("k", "name", "rating", "d_ts", "__op"), "d_ts")
    JoinView.refresh(view, fact, fa0, fact.currentVersion.get,
      dim, db0, dim.currentVersion.get, on, ts(3))
    assertViewCurrent(view, fact, dim)
    // spot checks of the tricky nettings: the fk-mover whose new partner
    // died nets to a delete; the insert picks up the POST-update dim row
    assert(view.read.filter(col("id") === 2L).count() == 0)
    assert(view.read.filter(col("id") === 5L).select("name").as[String].head() == "b2")
    assert(view.read.filter(col("id") === 1L).select("amount").as[Double].head() == 50.0)
  }

  test("a dimension-only window refreshes unchanged facts through the A_old term") {
    val (fact, dim, view) = fixture(tmpDir("jv3"))
    val (fa0, db0) = (fact.currentVersion.get, dim.currentVersion.get)
    dim.merge(Seq((10L, "a2", 9L, ts(2), "u")).toDF("k", "name", "rating", "d_ts", "__op"), "d_ts")
    JoinView.refresh(view, fact, fa0, fa0, dim, db0, dim.currentVersion.get, on, ts(3))
    assertViewCurrent(view, fact, dim)
    assert(view.read.filter(col("id") === 1L).select("rating").as[Long].head() == 9L)
  }

  test("a fact-only window leaves the dimension term empty and stays exact") {
    val (fact, dim, view) = fixture(tmpDir("jv4"))
    val (fa0, db0) = (fact.currentVersion.get, dim.currentVersion.get)
    fact.merge(Seq(
      (4L, 10L, 8.0, dt("1996-01-20"), ts(2), "u") // dangling fk repaired -> enters view
    ).toDF("id", "fk", "amount", "day", "f_ts", "__op"), "f_ts")
    JoinView.refresh(view, fact, fa0, fact.currentVersion.get,
      dim, db0, db0, on, ts(3))
    assertViewCurrent(view, fact, dim)
    assert(view.read.filter(col("id") === 4L).select("name").as[String].head() == "a")
  }

  test("chained windows stay exact and the refresh is idempotent per window") {
    val (fact, dim, view) = fixture(tmpDir("jv5"))
    var (fa, db) = (fact.currentVersion.get, dim.currentVersion.get)
    // window 1: fk move onto a surviving partner
    fact.merge(Seq((2L, 10L, 6.5, dt("1996-02-10"), ts(2), "u"))
      .toDF("id", "fk", "amount", "day", "f_ts", "__op"), "f_ts")
    JoinView.refresh(view, fact, fa, fact.currentVersion.get, dim, db, db, on, ts(3))
    assertViewCurrent(view, fact, dim)
    fa = fact.currentVersion.get
    // window 2: dim delete strips every fact pointing at it
    dim.merge(Seq((10L, "a", 1L, ts(4), "d")).toDF("k", "name", "rating", "d_ts", "__op"), "d_ts")
    JoinView.refresh(view, fact, fa, fa, dim, db, dim.currentVersion.get, on, ts(5))
    assertViewCurrent(view, fact, dim)
    assert(view.read.select("id").as[Long].collect().toSeq == Seq(3L),
      "facts 1 and 2 both pointed at the deleted dim row; only 3 (dim 30) remains")
    db = dim.currentVersion.get
    // re-applying the same (now empty) window is a no-op
    JoinView.refresh(view, fact, fa, fa, dim, db, db, on, ts(6))
    assertViewCurrent(view, fact, dim)
  }

  test("a dim insert repairing a dangling fk enriches the fact into the view") {
    val (fact, dim, view) = fixture(tmpDir("jv7"))
    val (fa0, db0) = (fact.currentVersion.get, dim.currentVersion.get)
    dim.merge(Seq((99L, "z", 7L, ts(2), "c")).toDF("k", "name", "rating", "d_ts", "__op"), "d_ts")
    JoinView.refresh(view, fact, fa0, fa0, dim, db0, dim.currentVersion.get, on, ts(3))
    assertViewCurrent(view, fact, dim)
    assert(view.read.filter(col("id") === 4L).select("name").as[String].head() == "z")
  }

  test("a fact deleted in the same window its dangling partner is inserted is NOT resurrected") {
    // the cancelling-pair hole a signed-netting refresh gets wrong: fact 4
    // (fk=99, dangling, so absent from the view) dies in the SAME window
    // dim key 99 appears — the two delta contributions cancel and the
    // correct refresh leaves the view without a row for it
    val (fact, dim, view) = fixture(tmpDir("jv8"))
    val (fa0, db0) = (fact.currentVersion.get, dim.currentVersion.get)
    dim.merge(Seq((99L, "z", 7L, ts(2), "c")).toDF("k", "name", "rating", "d_ts", "__op"), "d_ts")
    fact.merge(Seq((4L, 99L, 8.0, dt("1996-01-20"), ts(2), "d"))
      .toDF("id", "fk", "amount", "day", "f_ts", "__op"), "f_ts")
    JoinView.refresh(view, fact, fa0, fact.currentVersion.get,
      dim, db0, dim.currentVersion.get, on, ts(3))
    assertViewCurrent(view, fact, dim)
    assert(view.read.filter(col("id") === 4L).count() == 0)
  }

  test("an fk move onto an absent partner while the OLD partner is inserted stays out of the view") {
    // variant of the cancelling pair: fact 4 moves fk 99 -> 77 (77 never
    // exists) in the window dim 99 is inserted; a stale pre-move image
    // must not be upserted
    val (fact, dim, view) = fixture(tmpDir("jv9"))
    val (fa0, db0) = (fact.currentVersion.get, dim.currentVersion.get)
    dim.merge(Seq((99L, "z", 7L, ts(2), "c")).toDF("k", "name", "rating", "d_ts", "__op"), "d_ts")
    fact.merge(Seq((4L, 77L, 8.0, dt("1996-01-20"), ts(2), "u"))
      .toDF("id", "fk", "amount", "day", "f_ts", "__op"), "f_ts")
    JoinView.refresh(view, fact, fa0, fact.currentVersion.get,
      dim, db0, dim.currentVersion.get, on, ts(3))
    assertViewCurrent(view, fact, dim)
    assert(view.read.filter(col("id") === 4L).count() == 0)
  }

  test("colliding payload columns fail fast with the projection contract in the message") {
    val (fact, dim, _) = fixture(tmpDir("jv6"))
    val clash = dim.read.withColumn("amount", lit(0.0))
    val e = intercept[IllegalArgumentException] {
      JoinView.compute(fact.read, clash, on)
    }
    assert(e.getMessage.contains("amount"))
  }
}
