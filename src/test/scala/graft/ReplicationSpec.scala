package graft

import org.apache.spark.sql.functions._
import graft.cdc.{CdcPipeline, ChangeFeed}
import graft.envelope.EnvelopeCodec
import graft.ops.CdcTable

/** Table replication through the engine's own envelope bus:
  * change feed → [[EnvelopeCodec.encodeFeed]] → envelope files →
  * [[CdcPipeline]] ingest → replica table. Proves decode∘encode is the
  * identity over the wire format for inserts, updates, copy-on-write
  * AND vectored deletes, across several feed windows with the durable
  * cursor pacing delivery.
  */
class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  test("a table replicates exactly through encodeFeed -> envelope bus -> pipeline") {
    val root = tmpDir("replication")
    val src = new CdcTable(spark, s"$root/src", Seq("id"), retainVersions = 20)
    src.init(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "v", "amt"))
    val feed = new ChangeFeed(spark, src, s"$root/cursor")
    val envDir = s"$root/env"

    def ship(): Unit = {
      feed.poll((changes, _, toV) =>
        EnvelopeCodec.encodeFeed(changes, "src", "id", lit(toV * 1000L))
          .write.mode("append").parquet(envDir)): Unit
      new CdcPipeline(spark, envDir, s"$root/ckpt", s"$root/tables").runOnce()
    }
    def replica = new CdcTable(spark, s"$root/tables/src", Seq("id"))
    def snap(t: CdcTable): Seq[(Long, String, Long)] =
      t.read.select("id", "v", "amt").orderBy("id").as[(Long, String, Long)].collect().toSeq

    // window 1: bootstrap (whole snapshot as inserts)
    ship()
    assert(snap(replica) == snap(src))

    // window 2: update + insert + CoW delete, one poll
    src.merge(Seq((2L, "b2", 21L, "u"), (4L, "d", 40L, "c")).toDF("id", "v", "amt", "__op"), "amt")
    src.delete(col("id") === 1L)
    ship()
    assert(snap(replica) == snap(src))
    assert(snap(replica).map(_._1) == Seq(2L, 3L, 4L))

    // window 3: a VECTORED delete rides the same wire as any other
    src.deleteVectored(col("id") === 3L)
    ship()
    assert(snap(replica) == snap(src))

    // idempotent redelivery: re-shipping with no new source version is a
    // no-op, and re-processing the same envelopes cannot double-apply
    ship()
    assert(snap(replica) == snap(src) && snap(replica).map(_._1) == Seq(2L, 4L))
  }
}
