package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (beyond-reference surface).
  *
  * Media (image/audio/video) is modeled as an opaque `binary` payload plus
  * typed metadata — the schema a 100 TB multimodal training corpus uses in
  * parquet. Decode is REAL for every codec the JDK ships (zero added
  * dependencies): images via javax.imageio (PNG/JPEG/BMP/GIF — decode,
  * mean-RGB features, resize + re-encode) and audio via
  * javax.sound.sampled (WAV/AU/AIFF — channels, rate, duration, RMS).
  * Only video frame demuxing has no JDK codec and remains a clearly-marked
  * deterministic stub. Everything around the decoders — schema, typed
  * Dataset encoders, per-partition batch processing — is real and tested.
  *
  * At scale: `mapPartitions` keeps the decode batched per task (the Scala
  * analogue of mapInPandas batches); payloads never shuffle — feature
  * extraction happens before any wide operation and projects the binary
  * away.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           features: Array[Float])

  /** Decoded image metadata + channel means (0..255 scale). */
  case class ImageMeta(width: Int, height: Int,
                       meanR: Double, meanG: Double, meanB: Double)

  /** Decoded audio metadata; rms is over normalized [-1, 1] samples. */
  case class AudioMeta(channels: Int, sampleRateHz: Float, frames: Long,
                       durationSec: Double, rms: Double)

  /** REAL image decode (JDK javax.imageio): None when the payload is not a
    * decodable image. Pixel scan is one pass over the raster. */
  def decodeImage(payload: Array[Byte]): Option[ImageMeta] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        var r = 0.0; var g = 0.0; var b = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toDouble * img.getHeight
        Some(ImageMeta(img.getWidth, img.getHeight, r / n, g / n, b / n))
      }
    } catch { case _: Exception => None }

  /** REAL image resize: decode, nearest-quality rescale via Graphics2D,
    * re-encode as PNG. None when the payload is not a decodable image. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gfx = out.createGraphics()
        try gfx.drawImage(img, 0, 0, w, h, null) finally gfx.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** REAL audio decode (JDK javax.sound.sampled): header metadata plus RMS
    * amplitude over 16-bit PCM samples. None for undecodable payloads. */
  def decodeAudio(payload: Array[Byte]): Option[AudioMeta] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val bytes = in.readAllBytes()
        var sumSq = 0.0; var n = 0
        if (fmt.getSampleSizeInBits == 16) {
          val order =
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN
          val buf = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
          while (buf.hasRemaining) {
            val v = buf.get() / 32768.0
            sumSq += v * v; n += 1
          }
        }
        Some(AudioMeta(fmt.getChannels, fmt.getSampleRate, frames,
          if (fmt.getFrameRate > 0) frames / fmt.getFrameRate.toDouble else 0.0,
          if (n > 0) math.sqrt(sumSq / n) else 0.0))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Stand-in corpus: the documents table with its text re-encoded as the
    * opaque binary payload (real pipelines read true binary columns; the
    * schema and plumbing are identical). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Fallback feature fold for media types with no JDK codec: `dim`
    * features deterministically folded from the payload bytes. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { f(i % dim) += (payload(i) & 0xff) / 255.0f; i += 1 }
    f
  }

  /** Per-row feature dispatch by media type: real image / audio decode
    * through the JDK codecs, byte-fold fallback elsewhere (and for corrupt
    * payloads — a 100 TB corpus always contains some). */
  def featuresOf(r: MediaRow, dim: Int): Array[Float] = {
    val decoded =
      if (r.media_type.startsWith("image/"))
        decodeImage(r.payload).map(m => Array(m.width.toFloat, m.height.toFloat,
          m.meanR.toFloat, m.meanG.toFloat, m.meanB.toFloat))
      else if (r.media_type.startsWith("audio/"))
        decodeAudio(r.payload).map(m => Array(m.channels.toFloat, m.sampleRateHz,
          m.frames.toFloat, m.durationSec.toFloat, m.rms.toFloat))
      else None
    decoded.getOrElse(decodeStub(r.payload, dim))
  }

  /** Feature extraction over a media Dataset: typed mapPartitions so codec
    * setup amortizes per task, exactly where a model session would be
    * opened once per task (the Scala analogue of mapInPandas batches). */
  def extract(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-task setup would go here (codec/model init)
      rows.map { r =>
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          featuresOf(r, dim))
      }
    }
  }

  /** Feature extraction over the corpus media table. */
  def extractFeatures(s: SparkSession, dir: String, dim: Int = 8): Dataset[MediaFeatures] = {
    import s.implicits._
    extract(mediaTable(s, dir).as[MediaRow], dim)
  }

  /** STUB resize: a real implementation would decode, rescale to
    * (w, h), re-encode. Deterministic fake: proportionally sample payload
    * bytes to the target "pixel" count so output size tracks (w, h). */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(w * h, payload.length))
    val out = new Array[Byte](target)
    var i = 0
    while (i < target) { out(i) = payload((i.toLong * payload.length / target).toInt); i += 1 }
    out
  }

  /** STUB frame sampling: a real implementation would demux video and
    * decode every k-th frame. Deterministic fake: n evenly spaced payload
    * slices standing in for frames. Kept as the fallback for payloads
    * that are not RIFF/AVI (see [[demuxAviFrames]] for the real path). */
  def frameSampleStub(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val frames = math.max(1, math.min(n, payload.length))
    (0 until frames).map { f =>
      val start = f * payload.length / frames
      val end = (f + 1) * payload.length / frames
      java.util.Arrays.copyOfRange(payload, start, end)
    }
  }

  /** REAL video demux for RIFF/AVI containers (zero dependencies — RIFF is
    * a length-prefixed chunk format): walks the chunk tree to the `movi`
    * LIST and returns the video-frame chunk payloads (`##dc`/`##db`
    * stream chunks) in file order. For an MJPEG AVI each frame is a JPEG
    * decodable by [[decodeImage]]. None when the payload is not RIFF/AVI;
    * a truncated file yields the frames parsed up to the damage. */
  def demuxAviFrames(payload: Array[Byte]): Option[Seq[Array[Byte]]] = {
    def u32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(payload, o, 4, "US-ASCII")
    if (payload.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    val frames = Seq.newBuilder[Array[Byte]]
    // find every LIST whose type is 'movi', then collect its video chunks
    def walk(from: Int, until: Int): Unit = {
      var o = from
      while (o + 8 <= until) {
        val id = tag(o)
        val size = u32(o + 4).toInt
        val body = o + 8
        if (size < 0 || body + size > until) return // truncated: stop clean
        if (id == "LIST" && size >= 4) {
          if (tag(body) == "movi") collectFrames(body + 4, body + size)
          else walk(body + 4, body + size)
        }
        o = body + size + (size & 1) // chunks are word-aligned
      }
    }
    def collectFrames(from: Int, until: Int): Unit = {
      var o = from
      while (o + 8 <= until) {
        val id = tag(o)
        val size = u32(o + 4).toInt
        val body = o + 8
        if (size < 0 || body + size > until) return
        // 'rec ' LISTs group interleaved frames inside movi — recurse
        if (id == "LIST" && size >= 4 && tag(body) == "rec ")
          collectFrames(body + 4, body + size)
        // '##dc' compressed / '##db' uncompressed video stream chunks
        else if (id.length == 4 && id.charAt(2) == 'd' &&
            (id.charAt(3) == 'c' || id.charAt(3) == 'b'))
          frames += java.util.Arrays.copyOfRange(payload, body, body + size)
        o = body + size + (size & 1)
      }
    }
    walk(12, payload.length)
    Some(frames.result())
  }

  /** Every `step`-th frame of an AVI payload — the real demux path of the
    * frame-sampling operator. */
  def sampleAviFrames(payload: Array[Byte], step: Int): Option[Seq[Array[Byte]]] =
    demuxAviFrames(payload).map(_.zipWithIndex.collect {
      case (f, i) if i % step == 0 => f
    })

  case class FrameRow(doc_id: Long, frame_id: Int, frame_bytes: Long)

  /** Frame-sampling over the media table: one row per sampled frame —
    * the explode-shaped step of a video pipeline, batched per partition.
    * RIFF/AVI payloads demux for real ([[demuxAviFrames]]); anything else
    * falls back to the deterministic stub slices. */
  def sampleFrames(s: SparkSession, dir: String, n: Int = 4): Dataset[FrameRow] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = demuxAviFrames(r.payload)
          .getOrElse(frameSampleStub(r.payload, n))
        frames.zipWithIndex.map { case (fr, i) =>
          FrameRow(r.doc_id, i, fr.length.toLong)
        }
      }
    }
  }

  /** Oracle-checkable projection of the multimodal pipeline: payload byte
    * length per doc (the decode-independent part). */
  def mediaStats(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("doc_id"), col("media_type"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .orderBy(col("doc_id"))

  /** 64-bit perceptual average hash (aHash): REAL decode, bilinear
    * downsample to 8×8, Rec.601 luminance, bit i set when cell i is
    * brighter than the grid mean. Robust to re-encoding and resizing (the
    * downsample collapses them); near-duplicate images differ in a few
    * bits. None for undecodable payloads. */
  def aHash(payload: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val small = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gfx = small.createGraphics()
        gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(img, 0, 0, 8, 8, null)
        gfx.dispose()
        val lum = new Array[Double](64)
        var i = 0
        while (i < 64) {
          val p = small.getRGB(i % 8, i / 8)
          lum(i) = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
            0.114 * (p & 0xff)
          i += 1
        }
        val mean = lum.sum / 64
        var acc = 0L; i = 0
        while (i < 64) { if (lum(i) > mean) acc |= (1L << i); i += 1 }
        Some(acc)
      }
    } catch { case _: Exception => None }

  case class ImageHash(doc_id: Long, ahash: Long)

  /** Perceptual hashes for every decodable image in a media frame —
    * per-row decode, scan-speed, no shuffle. */
  def imageHashes(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.flatMap(r => aHash(r.payload).map(h => ImageHash(r.doc_id, h)))
  }

  /** Near-duplicate image pairs by Hamming distance over aHash — the
    * multimodal twin of the SimHash text pair search, using the same
    * pigeonhole construction: split the 64-bit hash into `blocks` equal
    * bit-blocks; any pair within `maxHamming` (< blocks) bits must agree
    * on at least one whole block, so candidates come from an equi-join on
    * (block_id, block_bits) — never an all-pairs scan — and the exact
    * Hamming filter keeps true near-dups. At 100 TB the hash table is a
    * persisted ingest artifact (like q67's reference signatures). */
  def imageDupPairs(hashes: DataFrame, maxHamming: Int = 7,
                    blocks: Int = 8): DataFrame = {
    require(maxHamming < blocks, "pigeonhole needs maxHamming < blocks")
    val width = 64 / blocks
    val mask = (1L << width) - 1
    val blockRows = hashes.select(col("doc_id"), col("ahash"),
        posexplode(array((0 until blocks).map(b =>
          shiftright(col("ahash"), b * width).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "block_id")
      .withColumnRenamed("col", "block_bits")
    blockRows.as("a")
      .join(blockRows.as("b"),
        col("a.block_id") === col("b.block_id") &&
        col("a.block_bits") === col("b.block_bits") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        graft.functions.Text.hamming64("a.ahash", "b.ahash").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id_a"), col("id_b"))
  }
}
