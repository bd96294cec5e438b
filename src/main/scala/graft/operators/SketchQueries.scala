package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import graft.functions.TextFunctions.{Sql, HashMod}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based near-dup detection: MinHash + LSH banding (q66) and
  * SimHash fingerprints (q67). Both use the engine-portable rolling hash
  * from TextFunctions so the DuckDB oracle can replay the exact pipeline.
  *
  * Scale notes (the whole point of these vs q61's exact self-join):
  * q66 never compares all pairs — each doc emits `bands` (4) bucket keys,
  * the candidate join is an equi-join on (band, key) that shuffles by
  * bucket, and only candidates are verified with exact Jaccard. At 100 TB
  * that's the standard shingle→minhash→band→bucket-join layout; bucket
  * skew (a giant near-dup cluster) is the one hazard, handled by AQE skew
  * splitting. q67 is pure per-row projection + two partial-agg shuffles
  * over (doc, bit) — no joins at all.
  */
object SketchQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.loadSpread(s, dir, n)

  private val NumHashes = 16
  private val Bands = 4
  private val Rows = 4
  private val SimBits = 61
  private val Spread = 2654435761L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pipeline shape for scale: the band join carries ONLY (doc_id, band,
    // key); cross-band duplicate candidates are eliminated WITHOUT a
    // distinct shuffle by the first-matching-band rule — a pair is kept
    // only in the lowest band where the two signatures collide, so every
    // pair surfaces exactly once and the whole candidate+verify path is
    // map-side (broadcast lookups), with the final ORDER BY as the only
    // shuffle. At 100 TB the per-doc lookup tables (band keys, sorted
    // token hashes) would be attached via a co-partitioned join on doc_id
    // instead of broadcast; the first-band rule is unchanged.
    "q66_minhash_lsh" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // The per-doc sketch table feeds five consumers (the band explode
      // and four broadcast lookup sides); persist it so the minhash chain
      // runs once, not per consumer. It is one row per doc of fixed-size
      // sketches — tiny relative to the corpus at any scale.
      val d = t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokenSet(col("text")))
        .withColumn("hs", array_sort(expr("graft_token_hashes(toks)")))
        .withColumn("mh", expr(s"graft_minhash(hs, $NumHashes)"))
        .withColumn("bks", expr(s"graft_band_keys(mh, $Bands, $Rows)"))
        .select(col("doc_id"), col("hs"), col("bks"))
        .persist()
      val banded = d.select(col("doc_id"),
          posexplode(col("bks")).as(Seq("band", "bkey")))
      val cand = banded.select(col("doc_id").as("id_lo"), col("band"), col("bkey"))
        .join(banded.select(col("doc_id").as("id_hi"),
          col("band").as("band_b"), col("bkey").as("bkey_b")),
          col("band") === col("band_b") && col("bkey") === col("bkey_b")
            && col("id_lo") < col("id_hi"))
        .select("id_lo", "id_hi", "band")
      val ka = d.select(col("doc_id").as("id_lo"), col("bks").as("bks_a"))
      val kb = d.select(col("doc_id").as("id_hi"), col("bks").as("bks_b"))
      // Unrolled CASE, not a HOF: Spark evaluates lambda functions
      // interpreted, which would dominate at 30M candidate rows; the CASE
      // stays inside whole-stage codegen. A colliding pair always matches
      // its last band if no earlier one, hence the ELSE arm.
      val firstMatch = expr((0 until Bands - 1)
        .map(i => s"WHEN bks_a[$i] = bks_b[$i] THEN $i")
        .mkString("CASE ", " ", s" ELSE ${Bands - 1} END"))
      val firstBand = cand
        .join(broadcast(ka), "id_lo").join(broadcast(kb), "id_hi")
        .filter(col("band") === firstMatch)
        .select("id_lo", "id_hi")
      val ha = d.select(col("doc_id").as("id_lo"), col("hs").as("hs_a"))
      val hb = d.select(col("doc_id").as("id_hi"), col("hs").as("hs_b"))
      firstBand.join(broadcast(ha), "id_lo").join(broadcast(hb), "id_hi")
        .withColumn("inter",
          expr("graft_sorted_intersect(hs_a, hs_b)").cast("double"))
        .withColumn("jac", graft.Dets.safeDiv(col("inter"),
          size(col("hs_a")) + size(col("hs_b")) - col("inter")))
        .filter(col("jac") >= 0.5)
        .select(col("id_lo"), col("id_hi"), round(col("jac"), 4).as("jac4"))
        .orderBy("id_lo", "id_hi")
    }),

    // Pure per-row projection: graft_simhash votes all 61 bits in one
    // codegen pass over the token hashes — the previous explode form
    // materialized |tokens| × 61 rows per doc through two shuffles. The
    // empty-token filter preserves the explode semantics (a doc with no
    // tokens emitted no rows, so it was absent from the result).
    "q67_simhash" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokenSet(col("text")))
        .withColumn("hs", expr("graft_token_hashes(toks)"))
        .filter(size(col("hs")) > 0)
        .select(col("doc_id"),
          expr(s"graft_simhash(hs, $SimBits, ${Spread}L)").as("simhash"))
        .orderBy("doc_id"))
  )

  private def sqlTokSet = Sql.tokenSet("text")

  val oracle: Map[String, String] = Map(
    "q66_minhash_lsh" ->
      s"""WITH d AS (
         |  SELECT doc_id, $sqlTokSet AS toks FROM documents
         |), th AS (
         |  SELECT doc_id, ${Sql.charHash("tok")} AS h
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM d) u
         |), mh AS (
         |  SELECT doc_id, k, MIN((h * (2*k + 1) + 7777 * k) % $HashMod) AS mhv
         |  FROM th CROSS JOIN (SELECT unnest(range(0, $NumHashes)) AS k) ks
         |  GROUP BY doc_id, k
         |), bands AS (
         |  SELECT doc_id, k // $Rows AS band,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT), list(mhv ORDER BY k)),
         |                     (a, b) -> (a * 31 + b) % ${TextFunctions.BandMod}) AS bkey
         |  FROM mh GROUP BY doc_id, k // $Rows
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id_lo, b.doc_id AS id_hi
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |)
         |SELECT c.id_lo, c.id_hi,
         |       ROUND(CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE)
         |             / len(list_distinct(da.toks || db.toks)), 4) AS jac4
         |FROM cand c
         |JOIN d da ON da.doc_id = c.id_lo
         |JOIN d db ON db.doc_id = c.id_hi
         |WHERE CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE)
         |      / len(list_distinct(da.toks || db.toks)) >= 0.5
         |ORDER BY id_lo ASC NULLS FIRST, id_hi ASC NULLS FIRST""".stripMargin,

    "q67_simhash" ->
      s"""WITH th AS (
         |  SELECT doc_id, ${Sql.charHash("tok")} * $Spread AS h2
         |  FROM (SELECT doc_id, unnest($sqlTokSet) AS tok FROM documents) u
         |), bits AS (
         |  SELECT doc_id, k,
         |         SUM(CASE WHEN (h2 >> k) & 1 = 1 THEN 1 ELSE -1 END) AS vote
         |  FROM th CROSS JOIN (SELECT unnest(range(0, $SimBits)) AS k) ks
         |  GROUP BY doc_id, k
         |)
         |SELECT doc_id,
         |       CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << k)
         |                     ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  )
}
