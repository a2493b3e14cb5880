package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * as a partition-local batch transform (`mapPartitions` over a typed
  * Dataset — Spark's Scala-side analogue of a Pandas-UDF batch).
  *
  * IMAGE decode is REAL: [[decodeImage]] reads PNG/JPEG/GIF/BMP through
  * the JDK's built-in `javax.imageio` codecs (no external jars), and
  * [[resize]] re-encodes a genuinely scaled PNG. Payloads ImageIO cannot
  * parse — and the audio/video kinds, whose codecs the JDK does not
  * ship — fall back to [[decodeStub]], which derives deterministic
  * pseudo-features from the bytes so the pipeline shape stays total.
  */
object Multimodal {

  /** A media row: opaque payload + metadata, the multimodal table schema. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta_len: Long)

  /** Extracted features per media item. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, width: Int, height: Int)

  /** FALLBACK decoder for payloads without a JDK codec (audio/video) or
    * that ImageIO cannot parse. Deterministic: derives a checksum and
    * pseudo-dimensions from the payload bytes alone, so the pipeline is
    * total and tests are stable.
    */
  def decodeStub(payload: Array[Byte]): (Long, Int, Int) = {
    var crc = 1125899906842597L
    var i = 0
    while (i < payload.length) { crc = 31 * crc + payload(i); i += 1 }
    val w = 64 + math.floorMod(crc, 512).toInt
    val h = 64 + math.floorMod(crc >> 9, 512).toInt
    (crc, w, h)
  }

  /** REAL image decode through `javax.imageio` (PNG/JPEG/GIF/BMP ship
    * with the JDK). Returns `(pixelChecksum, width, height)` — the
    * checksum sums the RGB of every pixel, so a passing value proves the
    * pixels were actually decoded, not sniffed from a header. None when
    * the payload is not a decodable image (caller falls back to
    * [[decodeStub]]). Decoding is per-row and allocation-bounded by the
    * image size; at 100 TB the executor-side cost profile is identical
    * to any codec UDF — partition-local, no shuffle.
    */
  def decodeImage(payload: Array[Byte]): Option[(Long, Int, Int)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += img.getRGB(x, y) & 0xffffff; x += 1 }
        y += 1
      }
      Some((sum, img.getWidth, img.getHeight))
    }
  }

  /** Partition-local feature extraction: one decoder instantiation per
    * partition (the expensive-init pattern real codecs need), streaming
    * over rows without materializing the partition. Image rows decode for
    * real ([[decodeImage]]); everything else (and undecodable payloads)
    * takes the deterministic stub path.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (crc, w, h) =
          (if (r.kind == "image") decodeImage(r.payload) else None)
            .getOrElse(decodeStub(r.payload))
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, crc, w, h)
      }
    }
  }

  /** Decoded-audio features: everything integer so cross-engine value
    * checks are exact. `rms` is `floor(sqrt(sumSquares / frames))` over
    * the decoded 16-bit samples; `peak` the max absolute sample.
    */
  final case class AudioFeatures(sampleRate: Long, channels: Long, frames: Long,
                                 rms: Long, peak: Long)

  /** REAL audio decode through `javax.sound.sampled` (WAV/AIFF PCM ships
    * with the JDK — no external jars, same deal as ImageIO). Parses the
    * container, streams the PCM frames, and computes sample statistics
    * from the DECODED samples — so matching feature values prove the
    * bytes actually round-tripped through the codec, not a header
    * sniff. None when the payload is not decodable audio (caller falls
    * back to [[decodeStub]]). 16-bit mono/stereo little-endian PCM, the
    * overwhelmingly common case; anything else returns None rather than
    * guessing.
    */
  def decodeAudio(payload: Array[Byte]): Option[AudioFeatures] = {
    import javax.sound.sampled.{AudioSystem, AudioFormat}
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (in == null) None
    else
      try {
        val f = in.getFormat
        val ok = f.getSampleSizeInBits == 16 && !f.isBigEndian &&
          f.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        if (!ok) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          var i = 0
          var sumSq = 0L
          var peak = 0L
          while (i < n) {
            val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toLong
            sumSq += s * s
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 1
          }
          val frames = n / f.getChannels
          val rms = if (n == 0) 0L else math.sqrt((sumSq / n).toDouble).toLong
          Some(AudioFeatures(f.getSampleRate.toLong, f.getChannels.toLong,
            frames.toLong, rms, peak))
        }
      } finally in.close()
  }

  /** Encode 16-bit mono PCM samples as a WAV payload through the JDK's
    * own writer — the audio twin of [[encodePng]]: decode tests and the
    * oracle fixture exercise the REAL codec end to end with
    * deterministic content and no binary assets.
    */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** A sampled video frame: one row per kept frame. */
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** REAL scaled re-encode for decodable images: decode, draw into a
    * `(w/factor, h/factor)` canvas, re-encode PNG (lossless, so the
    * scaled pixels round-trip exactly through a second decode). Payloads
    * ImageIO cannot parse keep the deterministic byte-stride stub so the
    * contract stays total: payload-in/payload-out with updated metadata,
    * schema preserved, partition-local execution.
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(factor >= 1, s"factor must be >= 1: $factor")
    media.mapPartitions { rows =>
      rows.map { r =>
        // same kind gate as extractFeatures: only image rows enter the
        // image codec — an audio/video payload that HAPPENS to parse as
        // an image must not be silently transcoded through the PNG path
        val out = (if (r.kind == "image") resizeImage(r.payload, factor) else None)
          .getOrElse(
            r.payload.indices.collect { case i if i % factor == 0 => r.payload(i) }.toArray)
        MediaRow(r.media_id, r.kind, out, out.length.toLong)
      }
    }
  }

  /** The real scaler behind [[resize]]: None when the payload is not a
    * decodable image.
    */
  def resizeImage(payload: Array[Byte], factor: Int): Option[Array[Byte]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val nw = math.max(1, img.getWidth / factor)
      val nh = math.max(1, img.getHeight / factor)
      val out = new java.awt.image.BufferedImage(
        nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, nw, nh, null): Unit
      finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      Some(baos.toByteArray)
    }
  }

  /** Deterministic tiny-PNG fixture: pixel (x, y) carries an RGB derived
    * from `(seed, x, y)` by integer mixing, encoded through the JDK's own
    * PNG writer — so decode tests exercise the REAL codec path end to
    * end with reproducible content and no binary test assets.
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var h = seed * 1000003L + x * 8191L + y * 131071L
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        img.setRGB(x, y, (h & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
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
