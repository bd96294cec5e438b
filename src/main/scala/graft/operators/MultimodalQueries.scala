package graft.operators

import graft.Tables
import graft.sources.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.1 multimodal plumbing as an ORACLE-GATED query (round 6 —
  * previously unit-test-only because no binary fixtures ship).
  *
  * Like the COPY gates (SourceQueries), the fixture is self-produced:
  * each document's text becomes an opaque `binary` payload with typed
  * (width, height, duration) metadata derived from its integer columns,
  * and the REAL typed pipeline runs over it — `Multimodal
  * .extractFeatures` (the mapPartitions batch-decode stage) for byte
  * counts, feature shape, and thumb boxes, plus a typed map through
  * `FakeDecoder.frameSampleMs` for frame sampling. The gated columns
  * are the integer-exact outputs (byte length, thumb box, frame count,
  * feature dimensionality) that DuckDB replays with blob/integer
  * arithmetic; the float feature VALUES stay covered by the unit specs
  * (float accumulation order is not oracle-comparable).
  */
object MultimodalQueries {

  /** q133's frame-sampling stride (ms); duration = n_chars · 10 ms. */
  private val FrameEveryMs = 500L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_media_features" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
      // coalesce keeps query and oracle unit-invariant if the fixture
      // ever gains nullable text: a NULL payload would decode to
      // n_bytes=0 here but NULL through the oracle's octet_length
      val media = docs.select(
          col("doc_id").as("media_id"),
          encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"),
          lit("txt").as("format"),
          (col("n_chars") % 640 + 1).cast("int").as("width"),
          (col("doc_id") % 480 + 1).cast("int").as("height"))
        .as[Multimodal.MediaRow]
      val feats = Multimodal.extractFeatures(media)
      val frames = docs
        .select(col("doc_id"), (col("n_chars") * 10L).as("dur"))
        .as[(Long, Long)]
        .map { case (id, dur) =>
          (id, Multimodal.FakeDecoder.frameSampleMs(dur, FrameEveryMs).length)
        }
        .toDF("media_id", "n_frames")
      feats.toDF()
        .select(col("media_id"), col("n_bytes"),
          size(col("feature")).as("feat_dim"),
          col("thumb_w"), col("thumb_h"))
        .join(frames, Seq("media_id"))
        .orderBy("media_id")
    })
  )

  val oracle: Map[String, String] = Map(
    // integer replay of the decode-stage outputs: octet length of the
    // UTF-8 payload, the aspect-preserving 64-box (integer division),
    // and ceil(duration / stride) frame sampling with the zero-duration
    // guard
    "q133_media_features" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |    CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n_bytes,
         |    CAST(n_chars % 640 + 1 AS INTEGER) AS w,
         |    CAST(doc_id % 480 + 1 AS INTEGER) AS h,
         |    n_chars * 10 AS dur
         |  FROM documents)
         |SELECT media_id, n_bytes, CAST(8 AS INTEGER) AS feat_dim,
         |  CAST(CASE WHEN w >= h THEN 64
         |       ELSE greatest(1, (w * 64) // h) END AS INTEGER) AS thumb_w,
         |  CAST(CASE WHEN w >= h THEN greatest(1, (h * 64) // w)
         |       ELSE 64 END AS INTEGER) AS thumb_h,
         |  CAST(CASE WHEN dur <= 0 THEN 1
         |       ELSE (dur + $FrameEveryMs - 1) // $FrameEveryMs END
         |    AS INTEGER) AS n_frames
         |FROM m ORDER BY media_id ASC NULLS FIRST""".stripMargin
  )
}
