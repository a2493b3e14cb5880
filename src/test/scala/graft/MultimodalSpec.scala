package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload plumbing: mapPartitions feature extraction is deterministic") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.syntheticMedia(spark, docs)
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == docs.count())
    // deterministic: same input -> same checksum on a second run
    val again = Multimodal.extractFeatures(media)
    assert(feats.orderBy("media_id").collect().toSeq ==
      again.orderBy("media_id").collect().toSeq)
    // features derive from payload bytes
    val f = feats.filter($"media_id" === 0L).head()
    val txt = docs.filter($"doc_id" === 0L).select("text").as[String].head()
    assert(f.n_bytes == txt.getBytes("UTF-8").length.toLong)
    assert(f.width >= 64 && f.width < 576 && f.height >= 64 && f.height < 576)
    feats.unpersist()
  }

  test("decode stub stands behind a stable contract (swap point for real codecs)") {
    val (crc1, w1, h1) = Multimodal.decodeStub("same bytes".getBytes)
    val (crc2, w2, h2) = Multimodal.decodeStub("same bytes".getBytes)
    val (crc3, _, _) = Multimodal.decodeStub("other bytes".getBytes)
    assert((crc1, w1, h1) == (crc2, w2, h2))
    assert(crc1 != crc3)
  }
}
