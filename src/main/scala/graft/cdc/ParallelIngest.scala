package graft.cdc

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.SparkSession

/** Multi-stream fan-out: run one CdcPipeline per (topic-pattern x table)
  * concurrently over a shared SparkSession — the reference's 40-thread
  * `ThreadPoolExecutor` driver parallelism (incremental_kafka_s3_cdc.py:
  * 449-460) re-expressed with scala.concurrent.Future. Spark schedules
  * the concurrent jobs fairly across the shared executor pool; each
  * stream keeps its own checkpoint directory, so restarts stay
  * per-stream independent exactly like the reference's per-topic
  * checkpoints.
  */
final class ParallelIngest(spark: SparkSession, maxConcurrent: Int = 8) {

  /** Run each (envelopeDir, checkpointDir, tableRoot) pipeline once,
    * concurrently; propagate the first failure after all complete.
    */
  def runAllOnce(streams: Seq[(String, String, String)]): Unit = {
    val pool = Executors.newFixedThreadPool(math.min(maxConcurrent, math.max(streams.size, 1)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = streams.map { case (env, ckpt, root) =>
        Future(new CdcPipeline(spark, env, ckpt, root).runOnce())
      }
      Await.result(Future.sequence(fs), Duration.Inf): Unit
    } finally pool.shutdown()
  }
}
