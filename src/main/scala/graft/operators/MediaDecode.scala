package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Batched media decode / feature extraction over binary payload
  * columns (north-star multimodal plumbing).
  *
  * ==== STUB DECODER ====
  * This container ships no image/audio/video codecs, so
  * `decodeFrames` is a deterministic FAKE: it chunks the payload into
  * fixed 32-byte "frames" and emits per-frame mean-byte "features".
  * A real deployment replaces ONLY the body of `decodeFrames` with
  * e.g. a JNI JPEG decoder or ffmpeg frame sampler — the surrounding
  * Spark plumbing (schema, encoders, per-partition batching,
  * distribution) is production-shaped and tested by MultimodalSpec.
  */
object MediaDecode {

  final case class MediaFeatures(
      doc_id: Long,
      n_frames: Int,
      feature_dim: Int,
      mean_intensity: Double,
      first_frame_hash: Long)

  private val FrameBytes = 32

  /** STUB: fake frame decode — replace with a real codec in production. */
  private def decodeFrames(payload: Array[Byte]): Seq[Array[Byte]] =
    payload.grouped(FrameBytes).toSeq

  /** Partition-batched extraction: one pass per partition, constant
    * memory per task, output schema fixed up front (the
    * `mapInPandas`-equivalent batch shape in Scala).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, payload) =>
          val frames = decodeFrames(payload)
          val means = frames.map(f => f.map(b => (b & 0xff).toDouble).sum / f.length)
          val firstHash = frames.headOption
            .map(f => java.util.Arrays.hashCode(f).toLong).getOrElse(0L)
          MediaFeatures(
            doc_id = docId,
            n_frames = frames.size,
            feature_dim = FrameBytes,
            mean_intensity = math.round(means.sum / math.max(means.size, 1) * 1e6) / 1e6,
            first_frame_hash = firstHash)
        }
      }
      .toDF()
      .orderBy(col("doc_id").asc_nulls_last)
  }
}
