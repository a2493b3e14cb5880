package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** First-class Structured Streaming operators of the engine, beyond the
  * CDC ingest path (cdc.CdcPipeline): event-time windowed aggregation
  * with watermarks, keyed stateful accumulation with checkpointed state,
  * and cross-batch streaming dedup. The reference needs none of these
  * (its state lives in the sink table — SURVEY.md §2.9); they are part of
  * the engine's extended streaming surface for pipeline workloads.
  */
object StreamOps {

  /** A typed event row (the `events` table shape, minus free-form JSON). */
  final case class Evt(event_id: Long, user_id: Long, event_type: String, ts: java.sql.Timestamp)

  /** Keyed running totals carried in streaming state. */
  final case class UserTotal(user_id: Long, n_events: Long, id_sum: Long)

  /** Tumbling-window counts per event type with an event-time watermark.
    * In append mode the watermark bounds state and lateness; scale-wise
    * this is one shuffle on (window, event_type) with partial aggregation.
    */
  def windowedCounts(events: DataFrame, tsCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Hopping (sliding) window counts — the streaming face of the batch
    * `x_hopping_window` oracle query: window(ts, dur, slide) Expands
    * each event into dur/slide overlapping windows, then one combine-
    * friendly hash aggregate per (window, type); the watermark expires
    * window state once event time passes `end + delay`, so state is
    * bounded by (horizon/slide) × |types| regardless of corpus size.
    */
  def hoppingCounts(events: DataFrame, tsCol: String, windowDur: String,
                    slide: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"))

  /** Keyed stateful accumulation: per-user totals maintained in streaming
    * state across micro-batches AND across restarts (state checkpointed
    * with the query). The engine's mapGroupsWithState surface.
    */
  def runningTotals(events: Dataset[Evt]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Evt], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0L))
          var n = prev.n_events
          var s = prev.id_sum
          batch.foreach { e => n += 1; s += e.event_id }
          val next = UserTotal(user, n, s)
          state.update(next)
          next
      }
  }

  /** An open or closed user session. */
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Streaming sessionizer (flatMapGroupsWithState): maintains one open
    * session per user in state; a gap larger than `gapMs` closes and
    * EMITS the finished session and opens a new one; an event-time
    * timeout (watermark passing end+gap) flushes idle sessions. This is
    * the streaming twin of the batch gaps-and-islands query
    * (x_sessionization) — same split rule.
    */
  def sessionize(events: Dataset[Evt], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[Evt], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val closed = state.get
            state.remove()
            Iterator.single(closed)
          } else {
            val times = batch.map(_.ts.getTime).toArray.sorted
            var open = state.getOption.orNull
            val closed = Seq.newBuilder[Session]
            times.foreach { t =>
              if (open == null) open = Session(user, t, t, 1L)
              else if (t - open.end_ms > gapMs) {
                closed += open
                open = Session(user, t, t, 1L)
              } else open = open.copy(end_ms = t, n_events = open.n_events + 1)
            }
            if (open != null) {
              state.update(open)
              state.setTimeoutTimestamp(open.end_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup by key: `dropDuplicates` backed by streaming
    * state, bounded by the event-time watermark (duplicates arriving
    * within the watermark horizon are dropped, state beyond it expires —
    * the scale-safe configuration).
    */
  def dedupStream(events: DataFrame, tsCol: String, watermarkDelay: String,
                  keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(keys :+ tsCol)

  /** Streaming debounce: drop a record whose KEY was already seen within
    * the watermark horizon, regardless of its event-time value —
    * `dropDuplicatesWithinWatermark`. Unlike [[dedupStream]] (which keys
    * state by (keys, ts) and only collapses exact-timestamp duplicates),
    * this keeps one state row per key and expires it once the watermark
    * passes, so re-deliveries with slightly different timestamps — the
    * at-least-once shape Kafka redelivery actually produces
    * (incremental_kafka_s3_cdc.py's source semantics) — still collapse.
    * State is bounded by keys-per-horizon; the batch face is the
    * `x_event_debounce` gap query.
    */
  def debounceStream(events: DataFrame, tsCol: String, watermarkDelay: String,
                     keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static enrichment join: each streaming event picks up its
    * dimension row from a static (batch) table by key. The static side
    * broadcasts — no streaming state at all — and Spark re-resolves the
    * static relation every micro-batch, so a dimension refresh between
    * batches is visible to the next one. The standard
    * dimension-enrichment topology at any scale: ship the small table to
    * the stream, never shuffle the stream to the table.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Watermarked stream-stream interval join: each lead event (an
    * impression, say) matches follow events (clicks) of the same user
    * arriving within [0, maxLagMs] of the lead's event time. Both sides
    * carry watermarks AND the join condition bounds event time in both
    * directions, so the state store evicts buffered rows once the
    * watermark passes the interval — the only configuration whose state
    * stays finite on an unbounded stream. Scale-wise this is one
    * co-partitioned shuffle on user_id for each side.
    */
  def intervalJoin(lead: Dataset[Evt], follow: Dataset[Evt],
                   leadWatermark: String, followWatermark: String,
                   maxLagMs: Long): DataFrame =
    intervalJoinWith(lead, follow, leadWatermark, followWatermark, maxLagMs, "inner")

  private def intervalJoinWith(lead: Dataset[Evt], follow: Dataset[Evt],
                               leadWatermark: String, followWatermark: String,
                               maxLagMs: Long, joinType: String): DataFrame = {
    val l = lead.toDF("l_event_id", "l_user_id", "l_event_type", "l_ts")
      .withWatermark("l_ts", leadWatermark)
    val f = follow.toDF("f_event_id", "f_user_id", "f_event_type", "f_ts")
      .withWatermark("f_ts", followWatermark)
    l.join(f, expr(
      s"""l_user_id = f_user_id AND
         |f_ts >= l_ts AND
         |f_ts <= l_ts + interval $maxLagMs millisecond""".stripMargin),
      joinType)
  }

  /** LEFT OUTER [[intervalJoin]]: every lead event emits — matched rows
    * as they join, unmatched ones with null follow columns once the
    * follow-side watermark passes the lead's interval end (only then can
    * the engine prove no match will arrive). The funnel-analysis join
    * face: "every impression, with its click if one came within the
    * window". Same bounded state as the inner form — both watermarks
    * plus the two-sided time bound are what make outer emission (and
    * state eviction) possible at all on an unbounded stream.
    */
  def intervalJoinOuter(lead: Dataset[Evt], follow: Dataset[Evt],
                        leadWatermark: String, followWatermark: String,
                        maxLagMs: Long): DataFrame =
    intervalJoinWith(lead, follow, leadWatermark, followWatermark, maxLagMs, "left_outer")

  /** Output-mode helper kept with the operators so call sites stay
    * declarative in specs and pipelines.
    */
  val Update: OutputMode = OutputMode.Update()
  val Append: OutputMode = OutputMode.Append()
  val Complete: OutputMode = OutputMode.Complete()
}
