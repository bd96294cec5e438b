package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with a typed metadata struct, and feature extraction runs as a
  * partition-local batch transform (`mapPartitions`), the Scala analog of
  * an arrow-batched Pandas UDF.
  *
  * The actual codec decode is STUBBED (this container ships no image/audio
  * libraries): [[FakeDecoder]] derives deterministic pseudo-features from
  * the payload bytes. Everything around it — schema, encoders, batch
  * iteration shape, partition sizing — is real and tested in
  * OperatorSpec/NullSafetySpec, so swapping in a real JNI/ffmpeg decoder changes one
  * function.
  *
  * Scale notes: payloads never pass through a shuffle — decode is a
  * narrow map over the scan, features (small, fixed-size) are what flows
  * downstream. `repartitionByBytes` exists because 100 TB of media means
  * partition count must track payload bytes, not row count.
  */
object Multimodal {

  /** (id, payload, meta{format, width, height, durationMs}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)
  ))

  final case class MediaRow(media_id: Long, payload: Array[Byte],
    format: String, width: Int, height: Int)

  final case class MediaFeatures(media_id: Long, n_bytes: Long,
    feature: Array[Float], thumb_w: Int, thumb_h: Int)

  /** Deterministic stand-in for a codec: would be `???` in production
    * form; here it derives a stable 8-dim signature from the bytes so the
    * pipeline is testable end-to-end. */
  object FakeDecoder {
    def features(payload: Array[Byte], dims: Int = 8): Array[Float] = {
      val out = new Array[Float](dims)
      var i = 0
      while (i < payload.length) {
        out(i % dims) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    /** "Resize": target box preserving aspect ratio, integer arithmetic. */
    def thumbBox(w: Int, h: Int, maxSide: Int = 64): (Int, Int) =
      if (w <= 0 || h <= 0) (0, 0)
      else if (w >= h) (maxSide, math.max(1, (h.toLong * maxSide / w).toInt))
      else (math.max(1, (w.toLong * maxSide / h).toInt), maxSide)

    /** "Frame sample": timestamps (ms) of evenly spaced frames, always
      * including frame 0, never exceeding the duration. */
    def frameSampleMs(durationMs: Long, everyMs: Long): Array[Long] =
      if (durationMs <= 0 || everyMs <= 0) Array(0L)
      else (0L until durationMs by everyMs).toArray
  }

  /** Batched partition-local decode: the Spark-side shape of a media
    * feature-extraction stage. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        val (tw, th) = FakeDecoder.thumbBox(r.width, r.height)
        MediaFeatures(r.media_id, payload.length.toLong,
          FakeDecoder.features(payload), tw, th)
      }
    }
  }

  /** Size partitions by payload bytes (not rows): target ~`targetMB` of
    * media per task so a 100 TB corpus doesn't produce 4 GB tasks. */
  def repartitionByBytes(df: DataFrame, targetMB: Int): DataFrame = {
    // sum() is NULL on an empty frame or all-null payloads — coalesce to
    // 0 and skip the shuffle entirely in that case.
    val totalBytes = df.select(coalesce(sum(length(col("payload"))), lit(0L)))
      .head.getLong(0)
    if (totalBytes == 0L) df
    else df.repartition(math.max(1,
      (totalBytes / (targetMB.toLong * 1024 * 1024)).toInt))
  }
}
