package graft

import org.apache.spark.sql.functions._
import graft.cdc.{CdcPipeline, ParallelIngest}
import graft.envelope.EnvelopeCodec

class ParallelIngestSpec extends SparkSpec {
  import spark.implicits._

  private def mkEnvelopes(n: Int, tsBase: Long) =
    (0 until n).map { i =>
      (i.toLong, new java.sql.Timestamp(tsBase + i), i.toLong % 7,
        if (i % 4 == 0) "signup" else "click", i * 2.0, s"""{"k": $i}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("N independent streams ingest concurrently over one session") {
    val root = tmpDir("paringest")
    val streams = (1 to 4).map { i =>
      val env = s"$root/env$i"
      EnvelopeCodec.synthesize(mkEnvelopes(50 * i, 1700000000000L + i))
        .write.parquet(env)
      (env, s"$root/ckpt$i", s"$root/tables$i")
    }
    new ParallelIngest(spark, maxConcurrent = 4).runAllOnce(streams)
    (1 to 4).foreach { i =>
      assert(new graft.ops.CdcTable(spark, s"$root/tables$i/events", Seq("event_id")).read.count() == 50L * i)
    }
  }

  test("keyless envelope (empty key JSON) degrades to append, duplicates kept") {
    val root = tmpDir("keyless")
    val env = EnvelopeCodec.synthesize(mkEnvelopes(20, 1700000000000L))
      .withColumn("key", lit("{}")) // no PK in the Debezium key
    env.write.parquet(s"$root/env")
    env.write.mode("append").parquet(s"$root/env2")

    val p = new CdcPipeline(spark, s"$root/env", s"$root/ckpt", s"$root/tables")
    p.runOnce()
    val t = new graft.ops.CdcTable(spark, s"$root/tables/events", Nil).read
    // pure insert path: every event lands, including the 'd'-op ones,
    // and no __op column consumption happened (K3 semantics)
    assert(t.count() == 20)

    // a second batch with the same content appends again (no merge key)
    EnvelopeCodec.synthesize(mkEnvelopes(20, 1700000000000L))
      .withColumn("key", lit("{}"))
      .write.mode("append").parquet(s"$root/env")
    new CdcPipeline(spark, s"$root/env", s"$root/ckpt", s"$root/tables").runOnce()
    assert(new graft.ops.CdcTable(spark, s"$root/tables/events", Nil).read.count() == 40)
  }
}
