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
    }),

    // Media storage census — the capacity-planning rollup over the
    // same typed decode pipeline (q133 gates the per-item stage; this
    // gates the AGGREGATE a storage owner reads): per orientation
    // class, media count, payload byte mass, the [D5] integer-staged
    // mean payload, the thumbnail pixel mass the derived assets will
    // cost, and the 500 ms frame budget. Every gated column is
    // integer-exact through the decode stage (byte lengths, box
    // arithmetic, ceil frame sampling) — the float feature values
    // stay spec-covered as in q133. One mapPartitions decode + one
    // keyed agg; payloads never shuffle past the decode stage.
    "q355_media_census" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
      val media = docs.select(
          col("doc_id").as("media_id"),
          encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"),
          lit("txt").as("format"),
          (col("n_chars") % 640 + 1).cast("int").as("width"),
          (col("doc_id") % 480 + 1).cast("int").as("height"))
        .as[Multimodal.MediaRow]
      val feats = Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("n_bytes"),
          col("thumb_w"), col("thumb_h"))
      val meta = docs.select(col("doc_id").as("media_id"),
        (col("n_chars") % 640 + 1).cast("int").as("w"),
        (col("doc_id") % 480 + 1).cast("int").as("h"),
        (col("n_chars") * 10L).as("dur"))
      feats.join(meta, Seq("media_id"))
        .withColumn("orient",
          when(col("w") >= col("h"), "landscape").otherwise("portrait"))
        .withColumn("frames",
          when(col("dur") <= 0, 1L).otherwise(
            expr(s"(dur + $FrameEveryMs - 1) div $FrameEveryMs")))
        .groupBy("orient")
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("thumb_w").cast("long") * col("thumb_h"))
            .as("thumb_pixels"),
          sum(col("frames")).as("total_frames"))
        .withColumn("mean_bytes",
          expr("(2 * total_bytes + n_media) div (2 * n_media)"))
        .select(col("orient"), col("n_media"), col("total_bytes"),
          col("mean_bytes"), col("thumb_pixels"), col("total_frames"))
        .orderBy("orient")
    }),

    // Exact media dedup by content digest — q60's exact-dedup applied
    // to the BINARY leg (the multimodal pipeline's first storage win:
    // identical payloads are the common case in crawled media, and the
    // digest groupBy never shuffles a payload byte — the same
    // shuffle-the-hash-not-the-content rule as the text exchange):
    // payloads collapse by (md5 hex, byte length), and the report is
    // the storage owner's savings row — media count, distinct
    // payloads, redundant copies, the largest clique, and the exact
    // redundant byte mass reclaimable by dedup. One digest projection
    // + two keyed aggs; md5 hex renders identically in both engines.
    "q367_media_dedup" -> ((s, dir) => {
      val media = Tables.load(s, dir, "documents")
        .select(encode(coalesce(col("text"), lit("")), "UTF-8")
          .as("payload"))
        .select(md5(col("payload")).as("h"),
          length(col("payload")).cast("long").as("nb"))
      media.groupBy("h", "nb").agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_media"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") - 1).as("n_redundant"),
          max(col("c")).as("max_clique"),
          sum(col("c") * col("nb")).as("total_bytes"),
          sum((col("c") - 1) * col("nb")).as("redundant_bytes"))
        .select(col("n_media"), col("n_distinct"), col("n_redundant"),
          col("max_clique"), col("total_bytes"), col("redundant_bytes"),
          expr("1000L * redundant_bytes div greatest(1L, total_bytes)")
            .as("savings_pm"))
    }),

    // Frame-budget ladder — the preprocessing-cost planner for the
    // video leg: total frames sampled at 250/500/1000 ms strides
    // (frame count IS the GPU-decode bill; the ladder shows what a
    // coarser stride buys). Pure integer ceil arithmetic over the
    // typed metadata, one conditional-sum row stacked to the 3-row
    // ladder; the per-media mean is [D5] integer-staged.
    "q356_frame_budget" -> ((s, dir) => {
      val meta = Tables.load(s, dir, "documents")
        .select((col("n_chars") * 10L).as("dur"))
      val aggs = count(lit(1)).as("n_media") +:
        FrameStrides.map(st =>
          sum(when(col("dur") <= 0, 1L).otherwise(
            expr(s"(dur + $st - 1) div $st"))).as(s"f$st"))
      meta.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${FrameStrides.size}, " +
          FrameStrides.map(st => s"cast($st as bigint), f$st")
            .mkString(", ") +
          ") as (stride_ms, total_frames)", "n_media")
        .select(col("stride_ms"), col("n_media"), col("total_frames"),
          (expr("(2 * total_frames * 10000 + n_media) div (2 * n_media)")
            .cast("double") / 10000.0).as("mean_frames4"))
        .orderBy("stride_ms")
    })
  )

  /** q356's stride ladder (ms). */
  private val FrameStrides = Seq(250L, 500L, 1000L)

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
         |FROM m ORDER BY media_id ASC NULLS FIRST""".stripMargin,

    // the digest replay: DuckDB's md5(VARCHAR) hashes the string's
    // UTF-8 bytes — the same bytes Spark's md5(encode(text,'UTF-8'))
    // sees — and hex renders identically; same collapse + savings
    "q367_media_dedup" ->
      """WITH m AS (
        |  SELECT md5(COALESCE(text, '')) AS h,
        |         CAST(octet_length(encode(COALESCE(text, '')))
        |           AS BIGINT) AS nb
        |  FROM documents),
        |g AS (SELECT h, nb, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM m GROUP BY 1, 2)
        |SELECT CAST(SUM(c) AS BIGINT) AS n_media,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |       CAST(SUM(c - 1) AS BIGINT) AS n_redundant,
        |       CAST(MAX(c) AS BIGINT) AS max_clique,
        |       CAST(SUM(c * nb) AS BIGINT) AS total_bytes,
        |       CAST(SUM((c - 1) * nb) AS BIGINT) AS redundant_bytes,
        |       CAST(1000 * SUM((c - 1) * nb)
        |            // greatest(1, SUM(c * nb)) AS BIGINT) AS savings_pm
        |FROM g""".stripMargin,

    // the census replay: same integer decode arithmetic, same
    // orientation class, [D5] integer-staged mean payload
    "q355_media_census" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |    CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT)
         |      AS n_bytes,
         |    CAST(n_chars % 640 + 1 AS INTEGER) AS w,
         |    CAST(doc_id % 480 + 1 AS INTEGER) AS h,
         |    n_chars * 10 AS dur
         |  FROM documents),
         |d AS (
         |  SELECT CASE WHEN w >= h THEN 'landscape'
         |         ELSE 'portrait' END AS orient,
         |    n_bytes,
         |    CAST(CASE WHEN w >= h THEN 64
         |         ELSE greatest(1, (w * 64) // h) END AS BIGINT) *
         |    CAST(CASE WHEN w >= h THEN greatest(1, (h * 64) // w)
         |         ELSE 64 END AS BIGINT) AS tpx,
         |    CASE WHEN dur <= 0 THEN 1
         |         ELSE (dur + $FrameEveryMs - 1) // $FrameEveryMs END
         |      AS frames
         |  FROM m),
         |per AS (
         |  SELECT orient, COUNT(*) AS n_media,
         |         CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
         |         CAST(SUM(tpx) AS BIGINT) AS thumb_pixels,
         |         CAST(SUM(frames) AS BIGINT) AS total_frames
         |  FROM d GROUP BY 1)
         |SELECT orient, CAST(n_media AS BIGINT) AS n_media, total_bytes,
         |       CAST((2 * total_bytes + n_media) // (2 * n_media)
         |         AS BIGINT) AS mean_bytes,
         |       thumb_pixels, total_frames
         |FROM per
         |ORDER BY orient ASC NULLS FIRST""".stripMargin,

    // the ladder replay: same ceil arithmetic at each stride,
    // UNION-ALL unpivot, [D5] integer-staged mean
    "q356_frame_budget" -> {
      val sums = FrameStrides.map(st =>
        s"SUM(CASE WHEN dur <= 0 THEN 1 ELSE (dur + $st - 1) // $st " +
          s"END) AS f$st").mkString(",\n         |         ")
      val rows = FrameStrides.map(st =>
        s"SELECT CAST($st AS BIGINT) AS stride_ms, n_media, " +
          s"f$st AS total_frames FROM a")
        .mkString("\n         |  UNION ALL ")
      s"""WITH m AS (SELECT n_chars * 10 AS dur FROM documents),
         |a AS (
         |  SELECT COUNT(*) AS n_media,
         |         $sums
         |  FROM m),
         |curve AS (
         |  $rows)
         |SELECT stride_ms, CAST(n_media AS BIGINT) AS n_media,
         |       CAST(total_frames AS BIGINT) AS total_frames,
         |       CAST((2 * total_frames * 10000 + n_media)
         |         // (2 * n_media) AS DOUBLE) / 10000.0 AS mean_frames4
         |FROM curve
         |ORDER BY stride_ms ASC NULLS FIRST""".stripMargin
    }
  )
}
