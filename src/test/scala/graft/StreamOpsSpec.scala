package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Evt

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private val evtSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "event_id BIGINT, user_id BIGINT, event_type STRING, ts TIMESTAMP")

  private def writeEvents(dir: String, ids: Range, typeOf: Int => String): Unit =
    ids.map(i => (i.toLong, i.toLong % 5, typeOf(i), new java.sql.Timestamp(1700000000000L + i * 60000L)))
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("append").parquet(dir)

  test("windowed counts equal the batch computation (complete mode)") {
    val root = tmpDir("streamops")
    writeEvents(s"$root/in", 0 until 600, i => if (i % 3 == 0) "click" else "view")
    val stream = spark.readStream.schema(evtSchema).parquet(s"$root/in")
    val q = StreamOps.windowedCounts(stream, "ts", "1 hour", "10 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("win_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("win_counts")
      .orderBy("w_start", "event_type").collect().toSeq
    val want = spark.read.parquet(s"$root/in")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .orderBy("w_start", "event_type").collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("hopping-window counts equal the batch twin; every event lands in exactly dur/slide windows") {
    val root = tmpDir("streamhop")
    writeEvents(s"$root/in", 0 until 600, i => if (i % 3 == 0) "click" else "view")
    val stream = spark.readStream.schema(evtSchema).parquet(s"$root/in")
    val q = StreamOps.hoppingCounts(stream, "ts", "2 hours", "1 hour", "10 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("hop_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("hop_counts")
      .orderBy("w_start", "event_type").collect().toSeq
    val want = spark.read.parquet(s"$root/in")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"))
      .orderBy("w_start", "event_type").collect().toSeq
    assert(got == want && got.nonEmpty)
    // the Expand invariant: summed window counts = 2x the event count
    val total = spark.table("hop_counts").agg(sum(col("n"))).head.getLong(0)
    assert(total == 2L * 600, s"each event must land in exactly 2 hopping windows, saw $total")
  }

  test("stateful running totals persist across micro-batches and restarts") {
    val root = tmpDir("streamops2")
    writeEvents(s"$root/in", 0 until 100, _ => "click")

    // update-mode emissions land in a per-run buffer via foreachBatch
    // (the memory sink cannot recover from a checkpoint; foreachBatch can)
    def runOnce(): Map[Long, StreamOps.UserTotal] = {
      val emitted = scala.collection.concurrent.TrieMap.empty[Long, StreamOps.UserTotal]
      val stream = spark.readStream.schema(evtSchema).parquet(s"$root/in").as[Evt]
      val q = StreamOps.runningTotals(stream)
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.UserTotal], _: Long) =>
          df.collect().foreach(t => emitted.put(t.user_id, t))
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      emitted.toMap
    }

    val t1 = runOnce()
    assert(t1.size == 5 && t1.values.map(_.n_events).sum == 100)
    assert(t1.values.map(_.id_sum).sum == (0 until 100).map(_.toLong).sum)

    // restart with more data: state restored from checkpoint, totals grow
    writeEvents(s"$root/in", 100 until 150, _ => "click")
    val t2 = runOnce()
    assert(t2.values.map(_.n_events).sum == 150)
    assert(t2.values.map(_.id_sum).sum == (0 until 150).map(_.toLong).sum)
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions at gap boundaries") {
    val root = tmpDir("streamops4")
    // user 1: burst at t0..t0+2min (3 events), burst at t0+5h (2 events),
    // then a final event at t0+10h — the first two sessions close, the
    // last stays open in state (stream never ends it)
    val t0 = 1700000000000L
    val rows = Seq(
      (1L, 1L, t0), (2L, 1L, t0 + 60000L), (3L, 1L, t0 + 120000L),
      (4L, 1L, t0 + 5 * 3600000L), (5L, 1L, t0 + 5 * 3600000L + 30000L),
      (6L, 1L, t0 + 10 * 3600000L)
    ).map { case (e, u, t) => (e, u, "click", new java.sql.Timestamp(t)) }
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .write.parquet(s"$root/in")

    val emitted = scala.collection.mutable.ArrayBuffer.empty[StreamOps.Session]
    val stream = spark.readStream.schema(evtSchema).parquet(s"$root/in").as[Evt]
    val q = StreamOps.sessionize(stream, gapMs = 2 * 3600000L)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.Session], _: Long) =>
        emitted.synchronized { emitted ++= df.collect() }: Unit
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val sessions = emitted.sortBy(_.start_ms)
    assert(sessions.map(_.n_events).toSeq == Seq(3L, 2L))
    assert(sessions.head.start_ms == t0 && sessions.head.end_ms == t0 + 120000L)
    assert(sessions(1).start_ms == t0 + 5 * 3600000L)
  }

  test("streamed stateful sessions equal the batch twin oracle query on the same events") {
    val dir = "/root/testdata/sf0.001"
    val root = tmpDir("streamops8")
    // one time-sorted file -> one initial micro-batch, so the stateful
    // path sees each user's events in order (the batch twin sorts by
    // definition; feeding the stream unordered would test file layout,
    // not the session rule)
    Tables(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "ts")
      .coalesce(1).sortWithinPartitions("ts", "event_id")
      .write.mode("append").parquet(s"$root/in")

    val emitted = scala.collection.mutable.ArrayBuffer.empty[StreamOps.Session]
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(evtSchema).parquet(s"$root/in").as[Evt]
      val q = StreamOps.sessionize(stream, gapMs = 2 * 3600000L)
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamOps.Session], _: Long) =>
          emitted.synchronized { emitted ++= df.collect() }: Unit
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // two sentinel runs: the first advances the watermark past every real
    // session's end+gap, the second lets the event-time timeouts fire and
    // flush the still-open last session of each user (timeout processing
    // uses the watermark checkpointed by the PREVIOUS batch)
    val maxTs = Tables(spark, dir, "events")
      .agg(max("ts")).head().getTimestamp(0).getTime
    for (k <- 1 to 2) {
      Seq((-k.toLong, -1L, "sentinel", new java.sql.Timestamp(maxTs + k * 24 * 3600000L)))
        .toDF("event_id", "user_id", "event_type", "ts")
        .write.mode("append").parquet(s"$root/in")
      runOnce()
    }

    val got = emitted.filter(_.user_id >= 0)
      .map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events)).sorted.toSeq
    val want = SparkEntry.queries("x_session_stateful_twin")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(got.nonEmpty && got == want,
      s"stateful sessions (${got.length}) must equal the batch twin (${want.length})")
  }

  test("stream-stream interval join matches follows within the lag window only") {
    val root = tmpDir("streamops5")
    val t0 = 1700000000000L
    // impressions: user 1 and user 2 at t0
    Seq((10L, 1L, "imp", new java.sql.Timestamp(t0)),
        (11L, 2L, "imp", new java.sql.Timestamp(t0)))
      .toDF("event_id", "user_id", "event_type", "ts").write.parquet(s"$root/lead")
    // clicks: u1 +5min (in window), u1 +30min (outside 10-min lag),
    // u2 +8min (in window), u3 +1min (no matching impression)
    Seq((20L, 1L, "click", new java.sql.Timestamp(t0 + 5 * 60000L)),
        (21L, 1L, "click", new java.sql.Timestamp(t0 + 30 * 60000L)),
        (22L, 2L, "click", new java.sql.Timestamp(t0 + 8 * 60000L)),
        (23L, 3L, "click", new java.sql.Timestamp(t0 + 60000L)))
      .toDF("event_id", "user_id", "event_type", "ts").write.parquet(s"$root/follow")

    val lead = spark.readStream.schema(evtSchema).parquet(s"$root/lead").as[Evt]
    val follow = spark.readStream.schema(evtSchema).parquet(s"$root/follow").as[Evt]
    val q = StreamOps.intervalJoin(lead, follow, "10 minutes", "10 minutes", 10 * 60000L)
      .writeStream.outputMode("append").format("memory").queryName("ij")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("ij")
      .select("l_event_id", "f_event_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L), (11L, 22L)))
  }

  test("left-outer interval join emits unmatched leads with nulls once the watermark passes") {
    val root = tmpDir("streamops7")
    val t0 = 1700000000000L
    // impressions: user 1 gets a click, user 2 never does
    Seq((10L, 1L, "imp", new java.sql.Timestamp(t0)),
        (11L, 2L, "imp", new java.sql.Timestamp(t0)))
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("append").parquet(s"$root/lead")
    Seq((20L, 1L, "click", new java.sql.Timestamp(t0 + 5 * 60000L)),
        (28L, 9L, "click", new java.sql.Timestamp(t0 + 60 * 60000L)))
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("append").parquet(s"$root/follow")

    // unmatched rows emit only in a batch that runs AFTER the watermark
    // passed their interval end — the two-run shape of an incremental
    // (trigger-once per invocation) pipeline
    val emitted = scala.collection.concurrent.TrieMap.empty[(Long, Long), Unit]
    def runOnce(): Unit = {
      val lead = spark.readStream.schema(evtSchema).parquet(s"$root/lead").as[Evt]
      val follow = spark.readStream.schema(evtSchema).parquet(s"$root/follow").as[Evt]
      val q = StreamOps.intervalJoinOuter(lead, follow, "10 minutes", "10 minutes", 10 * 60000L)
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select(col("l_event_id"), col("f_event_id")).collect().foreach(r =>
            emitted.put((r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)), ()))
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    assert(emitted.keySet.contains((10L, 20L)))
    assert(!emitted.keySet.exists(_._1 == 11L), "unmatched row must wait for the watermark")
    // runs 2-3: later events on BOTH sides (the global watermark is the
    // minimum across inputs) carry the watermark past u2's interval end —
    // the unmatched impression then emits with null follow columns
    for (late <- Seq(120L, 240L)) {
      Seq((30L + late, 8L, "imp", new java.sql.Timestamp(t0 + late * 60000L)))
        .toDF("event_id", "user_id", "event_type", "ts")
        .write.mode("append").parquet(s"$root/lead")
      Seq((40L + late, 9L, "click", new java.sql.Timestamp(t0 + late * 60000L)))
        .toDF("event_id", "user_id", "event_type", "ts")
        .write.mode("append").parquet(s"$root/follow")
      runOnce()
    }
    assert(emitted.keySet.contains((11L, -1L)),
      s"unmatched impression must emit with nulls after the watermark passes: $emitted")
    assert(!emitted.keySet.exists(p => p._1 == 11L && p._2 != -1L))
  }

  test("stream-static enrichment join broadcasts the dimension to the stream") {
    val root = tmpDir("streamops6")
    writeEvents(s"$root/in", 0 until 20, _ => "click")
    val dim = Seq((0L, "bronze"), (1L, "silver"), (2L, "gold"))
      .toDF("user_id", "tier") // users 3 and 4 have no dimension row
    val stream = spark.readStream.schema(evtSchema).parquet(s"$root/in")
    val q = StreamOps.enrich(stream, dim, "user_id")
      .writeStream.outputMode("append").format("memory").queryName("enriched")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("enriched")
    assert(got.count() == 20) // left join: unmatched users kept
    assert(got.filter(col("user_id") === 1L).select("tier")
      .distinct().as[String].collect().toSeq == Seq("silver"))
    assert(got.filter(col("user_id") === 4L).filter(col("tier").isNull).count() == 4)
  }

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    val root = tmpDir("streamops3")
    writeEvents(s"$root/in", 0 until 50, _ => "click")
    writeEvents(s"$root/in", 0 until 50, _ => "click") // exact duplicates

    val stream = spark.readStream.schema(evtSchema).parquet(s"$root/in")
    val q = StreamOps.dedupStream(stream, "ts", "1 hour", Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("deduped")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("deduped").count() == 50)
  }

  test("debounceStream collapses redeliveries with shifted timestamps; dedupStream does not") {
    val root = tmpDir("streamops4")
    // each event_id delivered twice, the redelivery 1s later — the
    // at-least-once shape where (key, ts) dedup keeps both copies
    (0 until 40).flatMap(i => Seq(
        (i.toLong, i.toLong % 5, "click", new java.sql.Timestamp(1700000000000L + i * 60000L)),
        (i.toLong, i.toLong % 5, "click", new java.sql.Timestamp(1700000000000L + i * 60000L + 1000L))))
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("append").parquet(s"$root/in")

    val byKey = StreamOps.debounceStream(
      spark.readStream.schema(evtSchema).parquet(s"$root/in"), "ts", "1 hour", Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("debounced")
      .trigger(Trigger.AvailableNow()).start()
    byKey.awaitTermination()
    assert(spark.table("debounced").count() == 40)
    assert(spark.table("debounced").select("event_id").distinct().count() == 40)

    val byKeyTs = StreamOps.dedupStream(
      spark.readStream.schema(evtSchema).parquet(s"$root/in"), "ts", "1 hour", Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("deduped_ts")
      .trigger(Trigger.AvailableNow()).start()
    byKeyTs.awaitTermination()
    assert(spark.table("deduped_ts").count() == 80)
  }
}
