package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Multimodal column plumbing (builder brief): image/audio/video travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run as partition-local batch transforms.
  *
  * The actual media decode is a DETERMINISTIC STUB — no image/audio codec
  * libraries exist in this environment. Everything around it is real and
  * scale-correct: schema, per-partition batching (one decoder init per
  * partition, not per row — the Scala analog of `mapInPandas` batch
  * shape), and the feature-vector contract downstream ANN/dedup operators
  * consume.
  */
object Multimodal {

  /** One media row: id + raw bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      format: String,
      feature_dim: Int,
      features: Array[Float])

  /** STUB decoder: a real implementation would decode `payload` with an
    * image/audio library and pool activations; this derives a
    * deterministic pseudo-feature vector from the payload bytes so the
    * pipeline shape (binary in → fixed-dim float vector out) is testable
    * end-to-end. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null) return out
    var i = 0
    while (i < dim) {
      out(i) = MurmurHash3.bytesHash(payload, i).toFloat / Int.MaxValue.toFloat
      i += 1
    }
    out
  }

  /** Partition-local batch feature extraction. The decoder "model" is
    * initialized once per partition (the expensive step at scale), then
    * applied to every record in that partition's iterator — never
    * per-row init, never a driver-side loop. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // one-time per-partition init point (decoder/model handle at scale)
      it.map { r =>
        MediaFeatures(r.media_id, r.format, dim, decodeStub(r.payload, dim))
      }
    }
  }

  /** STUB resize: a real implementation decodes, resamples to
    * `targetW`×`targetH` and re-encodes; this transforms the payload
    * deterministically (truncate/patch) so the metadata/payload contract —
    * new dimensions travel WITH the new bytes — is exercised for real. */
  def resizeStub(media: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val p = if (r.payload == null) Array.emptyByteArray
          else r.payload.take(math.max(1, math.min(r.payload.length, targetW * targetH)))
        r.copy(payload = p, width = targetW, height = targetH)
      }
    }
  }

  final case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])

  /** STUB frame sampling: one media row explodes into every `stride`-th
    * "frame" (payload slices stand in for decoded frames). The 1→N row
    * shape is the real contract — downstream per-frame feature extraction
    * and dedup operate on the exploded rows, partitioned by media_id. */
  def frameSampleStub(media: Dataset[MediaRecord], stride: Int, frameSize: Int = 16): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.payload == null || r.payload.isEmpty) Iterator.empty
      else r.payload.grouped(frameSize).zipWithIndex.collect {
        case (bytes, i) if i % stride == 0 => Frame(r.media_id, i, bytes)
      }
    }
  }

  /** Wrap a text DataFrame as fake media records (payload = utf-8 bytes) —
    * lets the binary-column pipeline run against the documents table. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("format"),
      col("n_chars").cast("int").as("width"),
      lit(1).as("height"))
      .as[MediaRecord]
  }
}
