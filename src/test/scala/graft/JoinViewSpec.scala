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

  test("a small dimension delta file-skips both snapshot passes: kept<total, zero footer reads") {
    import graft.ops.FileSkipping
    val root = tmpDir("jvprune")
    // fact clustered on fk (8 files, tight fk ranges), dim clustered on k
    val fact = new CdcTable(spark, s"$root/fact", Seq("id"), retainVersions = 10)
    val dim = new CdcTable(spark, s"$root/dim", Seq("k"), retainVersions = 10)
    val view = new CdcTable(spark, s"$root/view", Seq("id"), retainVersions = 10)
    fact.init((0L until 400L).map(i => (i, i % 50L, i * 1.0)).toDF("id", "fk", "amount")
      .repartitionByRange(8, col("fk")).sortWithinPartitions("fk"))
    dim.init((0L until 50L).map(k => (k, s"n$k")).toDF("k", "name")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k"))
    view.init(JoinView.compute(fact.read, dim.read, on)
      .withColumn(JoinView.TsCol, lit(ts(1))))
    val (f0, d0) = (fact.currentVersion.get, dim.currentVersion.get)
    // one changed dimension key; compaction re-clusters the merged dim
    // (the merge join hash-shuffles, so without it every file's k range
    // spans the domain and IN-list pruning has nothing to skip)
    dim.merge(Seq((10L, "n10b", ts(2), "u")).toDF("k", "name", "d_ts", "__op"), "d_ts")
    dim.compact(4, clusterBy = Seq("k"))
    val d2 = dim.currentVersion.get
    var aPreds: List[Seq[FileSkipping.Pred]] = Nil
    var bPreds: List[Seq[FileSkipping.Pred]] = Nil
    val before = FileSkipping.statFooterReads.get()
    val batch = JoinView.deltaBatch(
      fact.changesBetween(f0, f0), preds => { aPreds ::= preds; fact.readWhereAt(f0, preds) },
      dim.changesBetween(d0, d2), preds => { bPreds ::= preds; dim.readWhereAt(d2, preds) },
      on, Seq("id"))
    // every snapshot pass executed inside deltaBatch (the localCheckpoints
    // are eager) and both tables carry write-time sidecars — no footer read
    assert(FileSkipping.statFooterReads.get() == before,
      "pruned refresh scans must be served from write-time sidecars")
    // the derived predicates are exactly the delta's keys...
    assert(aPreds == List(Seq(FileSkipping.InSet("fk", Seq(10L)))))
    assert(bPreds == List(Seq(FileSkipping.InSet("k", Seq(10L)))))
    // ...and they actually skip files on the clustered layouts
    val (fKept, fTotal) = fact.scanProfileAt(f0, aPreds.head)
    assert(fTotal >= 8 && fKept < fTotal, s"fact pass must skip: $fKept of $fTotal")
    val (dKept, dTotal) = dim.scanProfileAt(d2, bPreds.head)
    assert(dTotal >= 4 && dKept < dTotal, s"dim pass must skip: $dKept of $dTotal")
    // and the refreshed view is still exactly the recompute
    view.merge(batch.withColumn(JoinView.TsCol, lit(ts(3))), JoinView.TsCol)
    assertViewCurrent(view, fact, dim)
    assert(view.read.filter(col("fk") === 10L).select("name").distinct()
      .as[String].collect().toSeq == Seq("n10b"))
  }

  test("a delta past the IN-list cap falls back to the unpruned scan and stays exact") {
    import graft.ops.FileSkipping
    val root = tmpDir("jvcap")
    val nKeys = JoinView.MaxPruneKeys + 104 // 4200 changed dim keys > the 4096 cap
    val fact = new CdcTable(spark, s"$root/fact", Seq("id"), retainVersions = 10)
    val dim = new CdcTable(spark, s"$root/dim", Seq("k"), retainVersions = 10)
    val view = new CdcTable(spark, s"$root/view", Seq("id"), retainVersions = 10)
    fact.init((0L until 100L).map(i => (i, i % nKeys.toLong, i * 1.0)).toDF("id", "fk", "amount"))
    dim.init((0L until nKeys.toLong).map(k => (k, s"n$k")).toDF("k", "name"))
    view.init(JoinView.compute(fact.read, dim.read, on)
      .withColumn(JoinView.TsCol, lit(ts(1))))
    val (f0, d0) = (fact.currentVersion.get, dim.currentVersion.get)
    // EVERY dim key changes in one window — past the cap
    dim.merge((0L until nKeys.toLong).map(k => (k, s"m$k")).toDF("k", "name")
      .withColumn("d_ts", lit(ts(2))).withColumn("__op", lit("u")), "d_ts")
    val d2 = dim.currentVersion.get
    var aPreds: List[Seq[FileSkipping.Pred]] = Nil
    val batch = JoinView.deltaBatch(
      fact.changesBetween(f0, f0), preds => { aPreds ::= preds; fact.readWhereAt(f0, preds) },
      dim.changesBetween(d0, d2), preds => dim.readWhereAt(d2, preds),
      on, Seq("id"))
    view.merge(batch.withColumn(JoinView.TsCol, lit(ts(3))), JoinView.TsCol)
    assert(aPreds == List(Nil), "an over-cap key set must fall back to the unpruned scan")
    assertViewCurrent(view, fact, dim)
    assert(view.read.filter(col("id") === 7L).select("name").as[String].head() == "m7")
  }

  test("left-outer view: partner-less facts survive null-padded; dim churn nets upserts, not deletes") {
    val root = tmpDir("jvouter")
    val fact = new CdcTable(spark, s"$root/fact", Seq("id"),
      partitionSource = Some("day"), retainVersions = 10)
    val dim = new CdcTable(spark, s"$root/dim", Seq("k"), retainVersions = 10)
    val view = new CdcTable(spark, s"$root/view", Seq("id"), retainVersions = 10)
    fact.init(Seq(
      (1L, 10L, 5.0, dt("1996-01-10")),
      (2L, 20L, 6.0, dt("1996-02-10")),
      (3L, 30L, 7.0, dt("1996-03-10")),
      (4L, 99L, 8.0, dt("1996-01-20")) // dangling fk: IN the outer view, null-padded
    ).toDF("id", "fk", "amount", "day"))
    dim.init(Seq((10L, "a", 1L), (20L, "b", 2L), (30L, "c", 3L))
      .toDF("k", "name", "rating"))
    view.init(JoinView.compute(fact.read, dim.read, on, outer = true)
      .withColumn(JoinView.TsCol, lit(ts(1))))
    assert(view.read.count() == 4)
    assert(view.read.filter(col("id") === 4L).select("name").head().isNullAt(0))
    val (f0, d0) = (fact.currentVersion.get, dim.currentVersion.get)
    // dim delete strips fact 1's partner (null-pad, NOT delete); fact 3
    // dies; fact 5 inserts with a void fk (null-padded from birth); fact
    // 2 reroutes onto the deleted key 10 (upsert-with-nulls)
    dim.merge(Seq((10L, "a", 1L, ts(2), "d")).toDF("k", "name", "rating", "d_ts", "__op"), "d_ts")
    fact.merge(Seq(
      (3L, 30L, 7.0, dt("1996-03-10"), ts(2), "d"),
      (2L, 10L, 6.0, dt("1996-02-10"), ts(2), "u"),
      (5L, 777L, 9.0, dt("1996-04-05"), ts(2), "c")
    ).toDF("id", "fk", "amount", "day", "f_ts", "__op"), "f_ts")
    JoinView.refresh(view, fact, f0, fact.currentVersion.get,
      dim, d0, dim.currentVersion.get, on, ts(3), outer = true)
    // equals the fresh left join of the end states
    val want0 = JoinView.compute(fact.read, dim.read, on, outer = true)
    val cols = want0.columns.sorted.toSeq
    val got = view.read.drop(JoinView.TsCol).select(cols.map(col): _*)
      .orderBy("id").collect().toSeq
    val want = want0.select(cols.map(col): _*).orderBy("id").collect().toSeq
    assert(got == want, s"outer view diverged:\n got $got\nwant $want")
    // the spot shapes: deleted fact gone; everything else present with
    // nulls where the partner is missing
    assert(view.read.count() == 4)
    assert(view.read.filter(col("id") === 3L).count() == 0)
    Seq(1L, 2L, 4L, 5L).foreach { id =>
      assert(view.read.filter(col("id") === id).select("name").head().isNullAt(0),
        s"fact $id must be null-padded")
    }
  }

  test("star: fact + two dims churning in one window equals the 3-way recompute") {
    val root = tmpDir("jvstar")
    val fact = new CdcTable(spark, s"$root/fact", Seq("id"),
      partitionSource = Some("day"), retainVersions = 10)
    val dimA = new CdcTable(spark, s"$root/dimA", Seq("ka"), retainVersions = 10)
    val dimB = new CdcTable(spark, s"$root/dimB", Seq("kb"), retainVersions = 10)
    val view = new CdcTable(spark, s"$root/view", Seq("id"), retainVersions = 10)
    val onA = Seq("fka" -> "ka")
    val onB = Seq("fkb" -> "kb")
    fact.init(Seq(
      (1L, 10L, 100L, 5.0, dt("1996-01-10")),
      (2L, 20L, 100L, 6.0, dt("1996-02-10")),
      (3L, 30L, 200L, 7.0, dt("1996-03-10")),
      (4L, 10L, 200L, 8.0, dt("1996-01-20"))
    ).toDF("id", "fka", "fkb", "amount", "day"))
    dimA.init(Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("ka", "aname"))
    dimB.init(Seq((100L, 1L), (200L, 2L)).toDF("kb", "brate"))
    val dims0 = Seq(dimA.read -> onA, dimB.read -> onB)
    view.init(JoinView.computeStar(fact.read, dims0)
      .withColumn(JoinView.TsCol, lit(ts(1))))
    assert(view.read.count() == 4)
    val (f0, a0, b0) = (fact.currentVersion.get, dimA.currentVersion.get, dimB.currentVersion.get)
    // all three churn in ONE window: dimA updates 10 / deletes 30 (fact 3
    // drops), dimB updates 200, fact 2 reroutes fka, fact 5 inserts
    dimA.merge(Seq(
      (10L, "a2", ts(2), "u"),
      (30L, "c", ts(2), "d")
    ).toDF("ka", "aname", "a_ts", "__op"), "a_ts")
    dimB.merge(Seq((200L, 22L, ts(2), "u")).toDF("kb", "brate", "b_ts", "__op"), "b_ts")
    fact.merge(Seq(
      (2L, 10L, 200L, 6.0, dt("1996-02-10"), ts(2), "u"),
      (5L, 20L, 100L, 9.0, dt("1996-04-05"), ts(2), "c")
    ).toDF("id", "fka", "fkb", "amount", "day", "f_ts", "__op"), "f_ts")
    JoinView.refreshStar(view, fact, f0, fact.currentVersion.get,
      Seq(JoinView.StarDim(dimA, a0, dimA.currentVersion.get, onA),
        JoinView.StarDim(dimB, b0, dimB.currentVersion.get, onB)),
      ts(3))
    val want0 = JoinView.computeStar(fact.read, Seq(dimA.read -> onA, dimB.read -> onB))
    val cols = want0.columns.sorted.toSeq
    val got = view.read.drop(JoinView.TsCol).select(cols.map(col): _*)
      .orderBy("id").collect().toSeq
    val want = want0.select(cols.map(col): _*).orderBy("id").collect().toSeq
    assert(got == want, s"star view diverged:\n got $got\nwant $want")
    // fact 3 lost its dimA partner (inner star): gone; fact 2 carries
    // BOTH updated payloads (a2 via reroute, rate 22 via dimB update)
    assert(view.read.filter(col("id") === 3L).count() == 0)
    val r2 = view.read.filter(col("id") === 2L).select("aname", "brate").head()
    assert((r2.getString(0), r2.getLong(1)) == (("a2", 22L)))
    // an empty follow-up window is a no-op
    val (f1, a1, b1) = (fact.currentVersion.get, dimA.currentVersion.get, dimB.currentVersion.get)
    JoinView.refreshStar(view, fact, f1, f1,
      Seq(JoinView.StarDim(dimA, a1, a1, onA), JoinView.StarDim(dimB, b1, b1, onB)), ts(4))
    val again = view.read.drop(JoinView.TsCol).select(cols.map(col): _*)
      .orderBy("id").collect().toSeq
    assert(again == want)
  }

  test("star, outer flavor: a dim delete null-pads instead of dropping") {
    val root = tmpDir("jvstarouter")
    val fact = new CdcTable(spark, s"$root/fact", Seq("id"), retainVersions = 10)
    val dimA = new CdcTable(spark, s"$root/dimA", Seq("ka"), retainVersions = 10)
    val dimB = new CdcTable(spark, s"$root/dimB", Seq("kb"), retainVersions = 10)
    val view = new CdcTable(spark, s"$root/view", Seq("id"), retainVersions = 10)
    val onA = Seq("fka" -> "ka")
    val onB = Seq("fkb" -> "kb")
    fact.init(Seq((1L, 10L, 100L, 5.0), (2L, 20L, 999L, 6.0))
      .toDF("id", "fka", "fkb", "amount")) // fact 2's fkb dangles from birth
    dimA.init(Seq((10L, "a"), (20L, "b")).toDF("ka", "aname"))
    dimB.init(Seq((100L, 1L)).toDF("kb", "brate"))
    view.init(JoinView.computeStar(fact.read,
      Seq(dimA.read -> onA, dimB.read -> onB), outer = true)
      .withColumn(JoinView.TsCol, lit(ts(1))))
    assert(view.read.count() == 2)
    val (f0, a0, b0) = (fact.currentVersion.get, dimA.currentVersion.get, dimB.currentVersion.get)
    dimA.merge(Seq((10L, "a", ts(2), "d")).toDF("ka", "aname", "a_ts", "__op"), "a_ts")
    JoinView.refreshStar(view, fact, f0, f0,
      Seq(JoinView.StarDim(dimA, a0, dimA.currentVersion.get, onA),
        JoinView.StarDim(dimB, b0, b0, onB)),
      ts(3), outer = true)
    val want0 = JoinView.computeStar(fact.read,
      Seq(dimA.read -> onA, dimB.read -> onB), outer = true)
    val cols = want0.columns.sorted.toSeq
    assert(view.read.drop(JoinView.TsCol).select(cols.map(col): _*).orderBy("id").collect().toSeq
      == want0.select(cols.map(col): _*).orderBy("id").collect().toSeq)
    assert(view.read.count() == 2)
    assert(view.read.filter(col("id") === 1L).select("aname").head().isNullAt(0))
  }

  test("colliding payload columns fail fast with the projection contract in the message") {
    val (fact, dim, _) = fixture(tmpDir("jv6"))
    val clash = dim.read.withColumn("amount", lit(0.0))
    val e = intercept[IllegalArgumentException] {
      JoinView.compute(fact.read, clash, on)
    }
    assert(e.getMessage.contains("amount"))
  }

  test("a misspelled star-dim payload column fails fast instead of silently vanishing from the view") {
    val root = tmpDir("jvbadpayload")
    val fact = new CdcTable(spark, s"$root/fact", Seq("id"), retainVersions = 10)
    val dim = new CdcTable(spark, s"$root/dim", Seq("ka"), retainVersions = 10)
    val view = new CdcTable(spark, s"$root/view", Seq("id"), retainVersions = 10)
    fact.init(Seq((1L, 10L, 5.0)).toDF("id", "fka", "amount"))
    dim.init(Seq((10L, "a")).toDF("ka", "aname"))
    view.init(JoinView.compute(fact.read, dim.read, Seq("fka" -> "ka"))
      .withColumn(JoinView.TsCol, lit(ts(1))))
    val (f0, d0) = (fact.currentVersion.get, dim.currentVersion.get)
    dim.merge(Seq((10L, "a2", ts(2), "u")).toDF("ka", "aname", "d_ts", "__op"), "d_ts")
    val e = intercept[IllegalArgumentException] {
      JoinView.refreshStar(view, fact, f0, f0,
        Seq(JoinView.StarDim(dim, d0, dim.currentVersion.get,
          Seq("fka" -> "ka"), payload = Some(Seq("anme")))), // typo'd column
        ts(3))
    }
    assert(e.getMessage.contains("anme"))
    // the correctly-spelled payload still works
    JoinView.refreshStar(view, fact, f0, f0,
      Seq(JoinView.StarDim(dim, d0, dim.currentVersion.get,
        Seq("fka" -> "ka"), payload = Some(Seq("aname")))), ts(3))
    assert(view.read.filter(col("id") === 1L).select("aname")
      .as[String].head() == "a2")
  }
}
