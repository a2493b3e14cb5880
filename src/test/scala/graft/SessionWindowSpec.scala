package graft

import org.apache.spark.sql.functions._

/** Spark's built-in session_window aggregation must agree with the
  * engine's gaps-and-islands sessionization (x_sessionization) — same gap,
  * same per-session event counts. Cross-validates the two formulations
  * (the built-in is the streaming-native path, the window form is the
  * oracle-checkable batch path).
  */
class SessionWindowSpec extends SparkSpec {

  test("session_window equals gaps-and-islands session splits") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir, "events")

    val builtin = events
      .groupBy(col("user_id"), session_window(col("ts"), "2 hours").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select("user_id", "n_events", "w.start")

    val manual = ParityQueries.queries("x_sessionization")(spark, dir)
      .select("user_id", "n_events", "sess_start")

    // same multiset of (user, session size, session start)
    val a = builtin.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime)).sorted
    val b = manual.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.sql.Timestamp]("sess_start").getTime)).sorted
    assert(a.length == b.length && a.sameElements(b))
  }
}
