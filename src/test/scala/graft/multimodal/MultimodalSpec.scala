package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binary payload plumbing: schema, byte counts, deterministic stub features") {
    val feats = Multimodal.extractFeatures(spark, sf, dim = 8).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(f => f.n_bytes > 0))
    // deterministic across evaluations
    val again = Multimodal.extractFeatures(spark, sf, dim = 8).collect()
    assert(feats.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (x, y) => x.features.sameElements(y.features) })
  }

  test("resize and frame-sample stubs: deterministic, size-correct, distributed") {
    val payload = (0 until 1000).map(_.toByte).toArray
    assert(Multimodal.resizeStub(payload, 10, 10).length === 100)
    assert(Multimodal.resizeStub(payload, 100, 100).length === 1000) // capped at source
    val frames = Multimodal.frameSampleStub(payload, 4)
    assert(frames.length === 4 && frames.map(_.length).sum === 1000)
    val rows = Multimodal.sampleFrames(spark, sf, n = 4).collect()
    assert(rows.groupBy(_.doc_id).forall(_._2.length == 4))
    assert(rows.forall(_.frame_bytes > 0))
  }

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(rateHz: Float, seconds: Double, amp: Double): Array[Byte] = {
    val n = (rateHz * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until n)
      bb.putShort((math.sin(2 * math.Pi * 440 * i / rateHz) * amp * 32767).toShort)
    val fmt = new javax.sound.sampled.AudioFormat(rateHz, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("REAL image decode: JDK codec roundtrip, mean RGB, resize") {
    val red = pngBytes(8, 6, 0xC80000) // R=200
    val meta = Multimodal.decodeImage(red).get
    assert(meta.width === 8 && meta.height === 6)
    assert(meta.meanR === 200.0 && meta.meanG === 0.0 && meta.meanB === 0.0)
    val resized = Multimodal.resizeImage(red, 4, 3).get
    val rMeta = Multimodal.decodeImage(resized).get
    assert(rMeta.width === 4 && rMeta.height === 3)
    assert(rMeta.meanR === 200.0) // solid color survives rescale exactly
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  test("REAL audio decode: WAV header metadata and RMS amplitude") {
    val wav = wavBytes(8000f, 0.5, amp = 0.5)
    val meta = Multimodal.decodeAudio(wav).get
    assert(meta.channels === 1)
    assert(meta.sampleRateHz === 8000f)
    assert(math.abs(meta.durationSec - 0.5) < 0.01)
    // RMS of a 0.5-amplitude sine is 0.5/sqrt(2) ~ 0.3536
    assert(math.abs(meta.rms - 0.3536) < 0.01)
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("feature dispatch: decoded media vs byte-fold fallback, distributed") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", pngBytes(5, 4, 0x0000FF)),
      Multimodal.MediaRow(2L, "audio/wav", wavBytes(8000f, 0.25, 0.9)),
      Multimodal.MediaRow(3L, "text/plain", "hello".getBytes("UTF-8")),
      Multimodal.MediaRow(4L, "image/png", "corrupt".getBytes("UTF-8")))
    val out = Multimodal.extract(rows.toDS(), dim = 8).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).features.take(2).sameElements(Array(5f, 4f))) // real decode
    assert(out(2L).features(1) === 8000f)                        // real audio rate
    assert(out(3L).features.length === 8)                        // fallback fold
    assert(out(4L).features.length === 8)                        // corrupt -> fallback
  }

  test("media stats match text byte lengths") {
    val s = spark
    import org.apache.spark.sql.functions._
    val stats = Multimodal.mediaStats(s, sf)
    val docs = graft.Tables.load(s, sf, "documents")
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("expect"))
    val joined = stats.join(docs, "doc_id")
      .filter(col("n_bytes") =!= col("expect"))
    assert(joined.count() === 0)
  }

  private def gradientPng(w: Int, h: Int, invert: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = x * 255 / math.max(1, w - 1)
      val v = if (invert) 255 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal RIFF/AVI writer for the demux fixture (little-endian sizes,
    * word-aligned chunks — the invariants the parser relies on). */
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = body.length & 1
    val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")); bb.putInt(body.length); bb.put(body)
    bb.array
  }
  private def riffList(typ: String, children: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("US-ASCII") ++ children)
  private def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    val hdrl = riffList("hdrl", riffChunk("avih", new Array[Byte](56)))
    val movi = riffList("movi", frames.flatMap(riffChunk("00dc", _)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(body.length); bb.put(body)
    bb.array
  }

  test("REAL video demux: MJPEG AVI frames extracted and decodable") {
    val reds = jpegBytes(16, 16, 0xff0000)
    val blue = jpegBytes(16, 16, 0x0000ff)
    val avi = aviBytes(Seq(reds, blue, reds))
    val frames = Multimodal.demuxAviFrames(avi).get
    assert(frames.length === 3)
    // each demuxed frame is a real JPEG the image decoder understands
    val metas = frames.map(f => Multimodal.decodeImage(f).get)
    assert(metas.forall(m => m.width == 16 && m.height == 16))
    assert(metas(0).meanR > 200 && metas(0).meanB < 80)  // red frame
    assert(metas(1).meanB > 200 && metas(1).meanR < 80)  // blue frame
    // every-2nd sampling keeps frames 0 and 2
    assert(Multimodal.sampleAviFrames(avi, step = 2).get.length === 2)
    // non-AVI payloads are not demuxed (stub fallback path)
    assert(Multimodal.demuxAviFrames(pngBytes(4, 4, 0xffffff)).isEmpty)
    // a truncated AVI yields the frames before the damage, no throw
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - blue.length)
    assert(Multimodal.demuxAviFrames(cut).get.length <= 3)
  }

  test("video demux recurses into 'rec ' LISTs inside movi") {
    // interleaved AVIs group frames into 'rec ' record lists; the demux
    // must descend into them, not skip them as opaque chunks
    val reds = jpegBytes(16, 16, 0xff0000)
    val blue = jpegBytes(16, 16, 0x0000ff)
    val rec = riffList("rec ", Seq(reds, blue).flatMap(riffChunk("00dc", _)).toArray)
    val movi = riffList("movi", rec ++ riffChunk("00dc", reds))
    val hdrl = riffList("hdrl", riffChunk("avih", new Array[Byte](56)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(body.length); bb.put(body)
    val frames = Multimodal.demuxAviFrames(bb.array).get
    assert(frames.length === 3) // 2 inside the rec list + 1 flat
    val metas = frames.map(f => Multimodal.decodeImage(f).get)
    assert(metas(0).meanR > 200 && metas(1).meanB > 200 && metas(2).meanR > 200)
  }

  test("aHash survives resize; pigeonhole pair search finds near-dups only") {
    val s = spark
    import s.implicits._
    val base = gradientPng(64, 64, invert = false)
    val resized = Multimodal.resizeImage(base, 32, 32).get // re-encoded copy
    val other = gradientPng(64, 64, invert = true)         // complemented
    val h1 = Multimodal.aHash(base).get
    val h2 = Multimodal.aHash(resized).get
    val h3 = Multimodal.aHash(other).get
    // the downsample collapses the resize: few bits drift
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 7,
      s"resize drifted ${java.lang.Long.bitCount(h1 ^ h2)} bits")
    // the inverted gradient flips (nearly) every bit
    assert(java.lang.Long.bitCount(h1 ^ h3) > 20)
    val media = Seq(
      Multimodal.MediaRow(1L, "image/png", base),
      Multimodal.MediaRow(2L, "image/png", resized),
      Multimodal.MediaRow(3L, "image/png", other)).toDS()
    val pairs = Multimodal.imageDupPairs(Multimodal.imageHashes(media).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // undecodable payloads drop out instead of throwing
    assert(Multimodal.aHash(Array[Byte](1, 2, 3)).isEmpty)
  }
}
