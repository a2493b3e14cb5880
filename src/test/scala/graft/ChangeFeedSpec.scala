package graft

import org.apache.spark.sql.functions._
import graft.cdc.ChangeFeed
import graft.ops.CdcTable

/** Durable change-feed subscription ([[graft.cdc.ChangeFeed]]): cursor
  * discipline, redelivery on failure, expiry behavior, and vectored
  * deletes flowing through.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def collectFeed(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String)] =
    df.select(col("id"), col("v"), col(CdcTable.ChangeTypeCol))
      .as[(Long, String, String)].collect().toSet

  test("bootstrap as inserts, then per-merge increments, exactly one delivery each") {
    val root = tmpDir("cf")
    val t = new CdcTable(spark, s"$root/t", Seq("id"), retainVersions = 10)
    t.init(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))
    val feed = new ChangeFeed(spark, t, s"$root/consumer")

    var got = Set.empty[(Long, String, String)]
    assert(feed.poll((df, _, _) => got = collectFeed(df)))
    assert(got == Set((1L, "a", "insert"), (2L, "b", "insert")))
    assert(feed.position == t.currentVersion)

    // current: no delivery, f not invoked
    assert(!feed.poll((_, _, _) => fail("must not be called when current")))

    // two merges before the next poll: ONE window covering both
    t.merge(Seq((2L, "b2", 2L, "u")).toDF("id", "v", "ts", "__op"), "ts")
    t.merge(Seq((3L, "c", 3L, "c")).toDF("id", "v", "ts", "__op"), "ts")
    var window = (0L, 0L)
    assert(feed.poll((df, from, to) => { got = collectFeed(df); window = (from, to) }))
    assert(got == Set((2L, "b", "update_preimage"), (2L, "b2", "update_postimage"),
      (3L, "c", "insert")))
    assert(window._2 == t.currentVersion.get && window._1 < window._2)
  }

  test("a failing consumer redelivers the same window; vectored deletes appear in the feed") {
    val root = tmpDir("cfretry")
    val t = new CdcTable(spark, s"$root/t", Seq("id"), retainVersions = 10)
    t.init(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))
    val feed = new ChangeFeed(spark, t, s"$root/consumer", bootstrapAsInserts = false)
    assert(feed.poll((_, _, _) => fail("bootstrapAsInserts=false delivers nothing")))
    val pinned = feed.position

    t.deleteVectored(col("id") === 1L)
    // consumer crashes mid-window: cursor must NOT advance
    intercept[RuntimeException](feed.poll((_, _, _) => throw new RuntimeException("sink down")))
    assert(feed.position == pinned, "a failed delivery must not advance the cursor")
    // retry redelivers the same change
    var got = Set.empty[(Long, String, String)]
    assert(feed.poll((df, _, _) => got = collectFeed(df)))
    assert(got == Set((1L, "a", "delete")))
    assert(!feed.poll((_, _, _) => fail("nothing new")))
  }

  test("lagging past retention throws instead of silently re-bootstrapping; reset re-hydrates") {
    val root = tmpDir("cfexp")
    val t = new CdcTable(spark, s"$root/t", Seq("id"), retainVersions = 2)
    t.init(Seq((1L, "a", 1L)).toDF("id", "v", "ts"))
    val feed = new ChangeFeed(spark, t, s"$root/consumer", bootstrapAsInserts = false)
    feed.poll((_, _, _) => ()): Unit
    // three commits with retainVersions=2 expire the pinned base
    (2 to 4).foreach(i =>
      t.merge(Seq((i.toLong, s"v$i", i.toLong, "c")).toDF("id", "v", "ts", "__op"), "ts"))
    val ex = intercept[Exception](feed.poll((df, _, _) => df.count(): Unit))
    assert(ex.isInstanceOf[CdcTable.ExpiredVersionException] ||
      ex.getCause.isInstanceOf[CdcTable.ExpiredVersionException],
      s"expired base must surface loudly, got $ex")
    // the consumer decides: reset + full re-hydration through the same path
    feed.reset()
    var n = 0L
    val feed2 = new ChangeFeed(spark, t, s"$root/consumer")
    assert(feed2.poll((df, _, _) => n = df.count()))
    assert(n == 4L)
  }
}
