package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads with
  * typed metadata, and batched per-partition feature extraction.
  *
  * The Spark-side plumbing is real and tested — schema, partition-sized batching,
  * decoder signature — while the media decode itself is STUBBED with a
  * deterministic fake (this container has no image/audio codecs). Swapping in a
  * real decoder means replacing [[StubDecoder.decode]] only; nothing in the plan
  * shape changes.
  *
  * Scale notes: payloads never pass through a shuffle here — extraction is a
  * narrow `mapPartitions` directly over the scan; metadata-only queries should
  * select the typed columns so the parquet reader prunes the (huge) binary column
  * away entirely.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Extracted features — fixed, flat schema so downstream is pure relational. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double)

  /** STUB decoder — deterministic fake standing in for a real codec call.
    * Derives pseudo-dimensions/intensity from the payload bytes so tests are
    * stable and the full pipeline (batching, schema, nullability) is exercised. */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val h = java.util.Arrays.hashCode(r.payload)
      val absH = math.abs(h.toLong)
      MediaFeatures(
        media_id = r.media_id,
        media_type = r.media_type,
        n_bytes = r.payload.length.toLong,
        width = (absH % 1920 + 1).toInt,
        height = (absH / 1920 % 1080 + 1).toInt,
        channels = 3,
        mean_intensity = (absH % 256).toDouble / 255.0)
    }
  }

  /** Pack a text table into the media shape (test stand-in for real media bytes:
    * `encode(text)` is the opaque payload). */
  def packFromText(df: DataFrame, idCol: String, textCol: String,
                   sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      col(sourceCol).as("source"))

  /** Batched feature extraction: one decoder invocation stream per partition —
    * the Scala analogue of `mapInPandas` (iterator-of-batches in, iterator out),
    * so decoder setup cost is amortized per partition, not per row. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition decoder setup would go here (codec contexts, model load)
      it.map(StubDecoder.decode)
    }
  }

  /** Video-style frame sampling plumbing: split each payload into fixed-size
    * pseudo-frames and keep every `stride`-th — demonstrates the explode shape
    * (one row in, many out) without a codec. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 1024, stride: Int = 2): DataFrame =
    media
      .withColumn("n_frames",
        greatest(ceil(length(col("payload")).cast("double") / frameBytes), lit(1)).cast("int"))
      .select(col("media_id"), col("media_type"), col("n_frames"),
        explode(filter(sequence(lit(0), col("n_frames") - 1),
          i => i % stride === 0)).as("frame_idx"))
}
