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

  test("resize preserves schema and shrinks payloads partition-locally") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.syntheticMedia(spark, docs)
    val small = Multimodal.resize(media, 4)
    assert(small.count() == media.count())
    val before = media.filter($"media_id" === 0L).head()
    val after = small.filter($"media_id" === 0L).head()
    assert(after.payload.length == (before.payload.length + 3) / 4)
    assert(after.meta_len == after.payload.length.toLong)
    assert(after.kind == before.kind)
  }

  test("frame sampling explodes video payloads into strided frame rows; others pass through") {
    val media = Seq(
      Multimodal.MediaRow(1L, "video", Array.range(0, 100).map(_.toByte), 100L),
      Multimodal.MediaRow(2L, "image", Array.range(0, 10).map(_.toByte), 10L))
      .toDS()
    val frames = Multimodal.sampleFrames(media, frameBytes = 10, stride = 3).collect()
    val vid = frames.filter(_.media_id == 1L).sortBy(_.frame_idx)
    // 10 pseudo-frames of 10 bytes, every 3rd kept: 0, 3, 6, 9
    assert(vid.map(_.frame_idx).toSeq == Seq(0, 3, 6, 9))
    assert(vid.forall(_.frame_bytes.length == 10))
    assert(vid.head.frame_bytes.toSeq == Array.range(0, 10).map(_.toByte).toSeq)
    val img = frames.filter(_.media_id == 2L)
    assert(img.length == 1 && img.head.frame_idx == 0 && img.head.frame_bytes.length == 10)
  }

  test("decode stub stands behind a stable contract (fallback for codec-less kinds)") {
    val (crc1, w1, h1) = Multimodal.decodeStub("same bytes".getBytes)
    val (crc2, w2, h2) = Multimodal.decodeStub("same bytes".getBytes)
    val (crc3, _, _) = Multimodal.decodeStub("other bytes".getBytes)
    assert((crc1, w1, h1) == (crc2, w2, h2))
    assert(crc1 != crc3)
  }

  test("real PNG decode round-trips exact dimensions and pixel-sum checksum") {
    val png = Multimodal.encodePng(7, 5, seed = 42L)
    val Some((sum1, w, h)) = Multimodal.decodeImage(png)
    assert((w, h) == (7, 5), "decoded dimensions must be the encoded ones, not header-sniffed fakes")
    val Some((sum2, _, _)) = Multimodal.decodeImage(Multimodal.encodePng(7, 5, seed = 42L))
    assert(sum1 == sum2, "same seed -> same pixels -> same checksum")
    val Some((sum3, _, _)) = Multimodal.decodeImage(Multimodal.encodePng(7, 5, seed = 43L))
    assert(sum1 != sum3, "checksum must depend on pixel content")
    // not an image -> None, never a fake success
    assert(Multimodal.decodeImage("plain text".getBytes).isEmpty)
  }

  test("extractFeatures decodes real image payloads through the Spark path; undecodable ones fall back") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Multimodal.encodePng(12, 9, seed = 7L), 0L),
      Multimodal.MediaRow(2L, "image", "not really an image".getBytes, 0L),
      Multimodal.MediaRow(3L, "audio", Multimodal.encodePng(12, 9, seed = 7L), 0L)
    ).toDS()
    val f = Multimodal.extractFeatures(media).collect().map(r => r.media_id -> r).toMap
    assert((f(1L).width, f(1L).height) == (12, 9), "real decode must surface real dimensions")
    val (stubCrc, stubW, stubH) = Multimodal.decodeStub("not really an image".getBytes)
    assert((f(2L).checksum, f(2L).width, f(2L).height) == (stubCrc, stubW, stubH),
      "undecodable image payloads take the stub path")
    assert((f(3L).width, f(3L).height) != (12, 9),
      "non-image kinds never enter the image codec, even with decodable bytes")
  }

  test("resize on a real PNG is a genuine scaled re-encode, still decodable") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Multimodal.encodePng(16, 10, seed = 3L), 0L)).toDS()
    val out = Multimodal.resize(media, 2).head()
    val Some((_, w, h)) = Multimodal.decodeImage(out.payload)
    assert((w, h) == (8, 5), "resize must scale the raster, not stride the bytes")
    assert(out.meta_len == out.payload.length.toLong)
  }

  test("real WAV decode: features come from the decoded PCM stream and match the source samples") {
    val samples = Array.tabulate(1000)(i => (((i * 104729) % 65536) - 32768).toShort)
    val wav = Multimodal.encodeWav(samples, 16000)
    assert(wav.length == 44 + 2 * samples.length, "canonical RIFF header + PCM16 data")
    val Some(f) = Multimodal.decodeAudio(wav)
    assert(f.sampleRate == 16000L && f.channels == 1L && f.frames == 1000L)
    val sumSq = samples.map(s => s.toLong * s.toLong).sum
    assert(f.rms == math.sqrt((sumSq / samples.length).toDouble).toLong)
    assert(f.peak == samples.map(s => math.abs(s.toLong)).max,
      "statistics must derive from the decoded samples, not the header")
    // junk and image payloads are not audio
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.decodeAudio(Multimodal.encodePng(8, 8, 1L)).isEmpty)
  }

  test("resize applies the same kind gate as extractFeatures: non-image rows never enter the codec") {
    val png = Multimodal.encodePng(16, 10, seed = 3L)
    val media = Seq(Multimodal.MediaRow(1L, "audio", png, 0L)).toDS()
    val out = Multimodal.resize(media, 2).head()
    val expected = png.indices.collect { case i if i % 2 == 0 => png(i) }.toArray
    assert(out.payload.sameElements(expected),
      "an audio payload that happens to parse as an image must take the byte-stride stub, not a PNG transcode")
  }
}
