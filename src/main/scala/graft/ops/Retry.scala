package graft.ops

/** Bounded retry with backoff around commit-like operations — the
  * reference wraps its MERGE in a 10-try/10s-sleep loop with a REFRESH
  * between attempts to ride out optimistic-concurrency conflicts
  * (incremental_kafka_s3_cdc.py:281-292). Plain parquet has no OCC
  * (single-writer assumption, SURVEY §7 risk e), so in this engine the
  * wrapper guards transient I/O instead; the shape and policy knobs are
  * the reference's.
  */
object Retry {

  /** Run `op`, retrying up to `attempts` times with `backoffMs` sleep;
    * `onRetry` runs between attempts (the reference's REFRESH TABLE).
    */
  def withRetries[T](attempts: Int = 10, backoffMs: Long = 10000L)
                    (onRetry: Int => Unit = _ => ())(op: => T): T = {
    var lastError: Throwable = null
    var i = 0
    while (i < attempts) {
      try return op
      catch {
        case e: Throwable =>
          lastError = e
          i += 1
          if (i < attempts) {
            Thread.sleep(backoffMs)
            onRetry(i)
          }
      }
    }
    throw lastError
  }
}
