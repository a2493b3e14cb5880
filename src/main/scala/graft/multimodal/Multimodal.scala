package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * as a partition-local batch transform (`mapPartitions` over a typed
  * Dataset — Spark's Scala-side analogue of a Pandas-UDF batch).
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): [[decodeStub]] produces deterministic pseudo-features from
  * the bytes. The Spark-side plumbing — schema, batching, partition-local
  * execution, feature schema — is real and tested (MultimodalSpec).
  */
object Multimodal {

  /** A media row: opaque payload + metadata, the multimodal table schema. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta_len: Long)

  /** Extracted features per media item. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, width: Int, height: Int)

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * derives a checksum and fake dimensions from the payload bytes alone,
    * so tests are stable. A real deployment swaps only this function.
    */
  def decodeStub(payload: Array[Byte]): (Long, Int, Int) = {
    var crc = 1125899906842597L
    var i = 0
    while (i < payload.length) { crc = 31 * crc + payload(i); i += 1 }
    val w = 64 + math.floorMod(crc, 512).toInt
    val h = 64 + math.floorMod(crc >> 9, 512).toInt
    (crc, w, h)
  }

  /** Partition-local feature extraction: one decoder instantiation per
    * partition (the expensive-init pattern real codecs need), streaming
    * over rows without materializing the partition.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (crc, w, h) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, crc, w, h)
      }
    }
  }

  /** A sampled video frame: one row per kept frame. */
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB resize — stands in for an image scaler. Deterministic: keeps a
    * byte every `factor` positions (a real scaler swaps only this body);
    * the plumbing contract is payload-in/payload-out with updated
    * metadata, schema preserved, partition-local execution.
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(factor >= 1, s"factor must be >= 1: $factor")
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = r.payload.indices.collect { case i if i % factor == 0 => r.payload(i) }.toArray
        MediaRow(r.media_id, r.kind, out, out.length.toLong)
      }
    }
  }

  /** STUB frame sampling — stands in for video frame extraction: the
    * payload divides into fixed-size pseudo-frames and every `stride`-th
    * one is kept, one output row per sampled frame (the explode shape a
    * real frame sampler produces). Non-video rows pass through with a
    * single frame 0.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(frameBytes >= 1 && stride >= 1, s"bad frameBytes=$frameBytes stride=$stride")
    media.flatMap { r =>
      if (r.kind != "video") Seq(Frame(r.media_id, 0, r.payload))
      else {
        val nFrames = math.max(1, r.payload.length / frameBytes)
        (0 until nFrames by stride).map { f =>
          val from = f * frameBytes
          Frame(r.media_id, f,
            java.util.Arrays.copyOfRange(r.payload, from, math.min(from + frameBytes, r.payload.length)))
        }
      }
    }
  }

  /** Build a synthetic media table from the documents table (text bytes as
    * payload) — the offline fixture for the plumbing.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      col("n_chars").as("meta_len")
    ).as[MediaRow]
  }
}
