package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.ops.{CdcTable, FileSkipping}

/** File-level data skipping ([[graft.ops.FileSkipping]]): footer stats
  * prune files a predicate cannot match, the month manifest prunes
  * partitions, and the pruned read always equals the plain filtered read.
  */
class FileSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def dt(s: String) = java.sql.Date.valueOf(s)

  /** 4 months x rows clustered on id: repartitionByRange gives each month
    * dir several files with tight, disjoint id ranges — the layout a
    * clustered 100 TB table has and skipping thrives on.
    */
  private def clusteredTable(root: String): CdcTable = {
    val rows = (0 until 400).map { i =>
      (i.toLong, s"u${i % 7}", dt(f"1996-${1 + i % 4}%02d-${1 + i % 28}%02d"))
    }
    val df = rows.toDF("id", "user", "day").repartitionByRange(4, col("id"))
    val t = new CdcTable(spark, s"$root/t", Seq("id"), partitionSource = Some("day"),
      retainVersions = 5)
    t.init(df)
    t
  }

  test("point lookup opens a fraction of the files and equals the plain filtered read") {
    val t = clusteredTable(tmpDir("skip1"))
    val preds = Seq(FileSkipping.Range("id", Some(10L), Some(20L)))
    val (kept, total) = t.scanProfile(preds)
    assert(total >= 8, s"fixture should produce many files, got $total")
    assert(kept < total, s"stats must prune some files: $kept of $total")
    val got = t.readWhere(preds).select("id").as[Long].collect().sorted.toSeq
    val want = t.read.filter(col("id") >= 10L && col("id") <= 20L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("a date range on the partition-source column prunes whole months before any footer is read") {
    val t = clusteredTable(tmpDir("skip2"))
    val preds = Seq(FileSkipping.Range("day", Some(dt("1996-02-01")), Some(dt("1996-03-31"))))
    val (_, totalInRange) = t.scanProfile(preds)
    val (_, totalAll) = t.scanProfile(Nil)
    assert(totalInRange < totalAll,
      "month pruning must shrink the candidate set before file stats apply")
    val got = t.readWhere(preds).count()
    val want = t.read.filter(col("day").between(dt("1996-02-01"), dt("1996-03-31"))).count()
    assert(got == want && got > 0)
  }

  test("stats are cached in an immutable sidecar; a statless directory keeps all files but stays correct") {
    val root = tmpDir("skip3")
    val t = clusteredTable(root)
    t.scanProfile(Seq(FileSkipping.Range("id", Some(0L), Some(1L)))): Unit
    val sidecars = {
      def walk(f: File): Seq[File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new File(root)).filter(_.getName == FileSkipping.SidecarName)
    }
    assert(sidecars.nonEmpty, "first pruned scan must persist the stats sidecar")
    // wipe the sidecars: a pre-stats table cannot prune, must not misread
    sidecars.foreach(_.delete())
    val preds = Seq(FileSkipping.Range("id", Some(10L), Some(20L)))
    assert(t.readWhere(preds).count() ==
      t.read.filter(col("id").between(10L, 20L)).count())
  }

  test("an all-null column is skippable; a column with no stats never prunes") {
    val allNull = FileSkipping.ColStat(None, None, nulls = 100L)
    assert(!FileSkipping.mayMatch(allNull, FileSkipping.Range("c", Some(1L), None)),
      "no comparison predicate matches a file whose column is entirely null")
    val wide = FileSkipping.ColStat(Some(0L), Some(100L), 0L)
    assert(FileSkipping.mayMatch(wide, FileSkipping.Eq("c", 50)))
    assert(!FileSkipping.mayMatch(wide, FileSkipping.Eq("c", 200)))
    assert(FileSkipping.mayMatch(wide, FileSkipping.Range("c", None, Some(0L))))
    assert(!FileSkipping.mayMatch(wide, FileSkipping.Range("c", Some(101L), None)))
  }

  test("readFiltered extracts ranges from a plain Column predicate and equals read.filter") {
    val t = clusteredTable(tmpDir("skip5"))
    val pred = col("id").between(10L, 20L) &&
      col("day") >= dt("1996-01-01") && col("user") =!= "u6"
    val ranges = FileSkipping.rangesOf(pred)
    assert(ranges.exists(r => r.column == "id" && r.lower.contains(10L) && r.upper.contains(20L)))
    assert(ranges.exists(r => r.column == "day" && r.lower.contains("1996-01-01")),
      "date literal must extract (internal day-int -> ISO string domain)")
    assert(!ranges.exists(_.column == "user"), "a =!= conjunct is residual-only")
    val got = t.readFiltered(pred).select("id").as[Long].collect().sorted.toSeq
    val want = t.read.filter(pred).select("id").as[Long].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
    // an OR tree extracts nothing but still answers exactly
    val orPred = col("id") === 5L || col("user") === "u2"
    assert(FileSkipping.rangesOf(orPred).isEmpty)
    assert(t.readFiltered(orPred).count() == t.read.filter(orPred).count())
  }

  test("clustered compaction tightens file ranges: the same predicate opens fewer files after compact(clusterBy)") {
    val root = tmpDir("skip6")
    // UNclustered layout: rows round-robin over 4 tasks, so every file in
    // every month spans nearly the full id range — stats cannot prune
    val rows = (0 until 400).map { i =>
      (i.toLong, s"u${i % 7}", dt(f"1996-${1 + i % 4}%02d-${1 + i % 28}%02d"))
    }
    val t = new CdcTable(spark, s"$root/t", Seq("id"), partitionSource = Some("day"),
      retainVersions = 5)
    t.init(rows.toDF("id", "user", "day").repartition(4))
    val preds = Seq(FileSkipping.Range("id", Some(10L), Some(20L)))
    val (keptBefore, totalBefore) = t.scanProfile(preds)
    assert(keptBefore == totalBefore, "round-robin layout leaves nothing to prune")
    t.compact(target = 4, clusterBy = Seq("id"))
    val (keptAfter, totalAfter) = t.scanProfile(preds)
    assert(totalAfter > 1, s"clustered compaction must keep multiple files, got $totalAfter")
    assert(keptAfter < totalAfter, s"re-clustering must make stats prune: $keptAfter of $totalAfter")
    val got = t.readWhere(preds).select("id").as[Long].collect().sorted.toSeq
    assert(got == (10L to 20L).toSeq)
  }

  test("string and date stats prune; merge-evolved files lacking the column are kept") {
    val root = tmpDir("skip4")
    val t = clusteredTable(root)
    // string predicate over the low-cardinality user column: every file
    // holds most users, so string stats rarely prune here — but results
    // must still be exact
    val sPreds = Seq(FileSkipping.Eq("user", "u3"))
    assert(t.readWhere(sPreds).count() == t.read.filter(col("user") === "u3").count())
    // schema evolution: new column exists only in post-merge files; a
    // predicate on it keeps (cannot prune) old files yet reads correctly
    t.merge(
      Seq((1000L, "u9", dt("1996-01-15"), 7L, 1L, "c"))
        .toDF("id", "user", "day", "score", "ts", "__op"), "ts")
    val nPreds = Seq(FileSkipping.Range("score", Some(5L), None))
    val got = t.readWhere(nPreds).select("id").as[Long].collect().toSeq
    assert(got == Seq(1000L))
  }
}
