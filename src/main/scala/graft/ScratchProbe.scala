package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicLong, AtomicInteger}

// temporary probe: wall vs summed task time per query — is a query
// throughput-bound (task time >> wall * cores would mean queueing) or
// stage-latency-bound (task time << wall)? (not shipped)
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("SELECT count(*) FROM range(1000000)").collect()

    val taskMs = new AtomicLong(0)
    val tasks = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        taskMs.addAndGet(t.taskInfo.duration): Unit
        tasks.incrementAndGet(): Unit
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(): Unit
      }
    })

    val names = if (args.nonEmpty) args.toSeq
      else Seq("x_ann_recall", "x_heavy_hitters", "x_pca_explained", "x_pagerank")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm rep (fixture/view builds land here)
      (1 to 2).foreach { rep =>
        taskMs.set(0); tasks.set(0); stages.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a beat to drain
        Thread.sleep(300)
        println(f"[probe] $n%-24s rep$rep wall=$wall%7.3f s  taskSum=${taskMs.get / 1e3}%8.3f s  tasks=${tasks.get}%5d  stages=${stages.get}%3d  busyFrac=${taskMs.get / 1e3 / (wall * cpus.toInt)}%5.3f")
      }
    }
    spark.stop()
  }
}
