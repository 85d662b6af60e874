package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (beyond-reference surface).
  *
  * Media (image/audio/video) is modeled as an opaque `binary` payload plus
  * typed metadata — the schema a 100 TB multimodal training corpus uses in
  * parquet. The decode step is STUBBED (no image/audio libs in this
  * container): `decodeStub` derives deterministic fake features from the
  * payload bytes. Everything around it — schema, typed Dataset encoders,
  * per-partition batch processing, partition sizing — is real and tested.
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

  /** Stand-in corpus: the documents table with its text re-encoded as the
    * opaque binary payload (real pipelines read true binary columns; the
    * schema and plumbing are identical). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: a real implementation would decode the image/audio here
    * (e.g. JPEG -> HxWx3). Deterministic fake: `dim` features folded from
    * the payload bytes. Runs batched per partition, like mapInPandas. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { f(i % dim) += (payload(i) & 0xff) / 255.0f; i += 1 }
    f
  }

  /** Feature extraction over the media table: typed mapPartitions so the
    * (stubbed) decoder amortizes any per-batch setup, exactly where a model
    * session / codec context would be opened once per task. */
  def extractFeatures(s: SparkSession, dir: String, dim: Int = 8): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { rows =>
      // per-task setup would go here (codec/model init)
      rows.map { r =>
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          decodeStub(r.payload, dim))
      }
    }
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
    * slices standing in for frames. */
  def frameSampleStub(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val frames = math.max(1, math.min(n, payload.length))
    (0 until frames).map { f =>
      val start = f * payload.length / frames
      val end = (f + 1) * payload.length / frames
      java.util.Arrays.copyOfRange(payload, start, end)
    }
  }

  case class FrameRow(doc_id: Long, frame_id: Int, frame_bytes: Long)

  /** Frame-sampling over the media table: one row per sampled frame —
    * the explode-shaped step of a video pipeline, batched per partition. */
  def sampleFrames(s: SparkSession, dir: String, n: Int = 4): Dataset[FrameRow] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        frameSampleStub(r.payload, n).zipWithIndex.map { case (fr, i) =>
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
}
