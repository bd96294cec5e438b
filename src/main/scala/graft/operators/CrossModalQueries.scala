package graft.operators

import graft.Tables
import graft.functions.TextFunctions.Sql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-modal compositions over the doc_id ↔ vec_id bridge: q225
  * writes through it (text-stage curation driving embedding-side
  * semantic suppression) and q229 reads through it (semantic top-k
  * retrieval restricted to curation survivors).
  *
  * q225 — the missing join between the
  * documents-side curation state and the embeddings-side semantic
  * near-dup graph that a real training-data pipeline runs as ONE pass:
  *
  *   1. text stage: exact dedup (canonical = min doc_id per identical
  *      text) + a quality floor (n_chars ≥ 100);
  *   2. bridge: surviving doc_ids index the embedding table
  *      (doc_id ↔ vec_id at the fixture's shared cardinality);
  *   3. embedding stage: among SURVIVORS ONLY, semantic near-dup
  *      suppression — drop any doc with a smaller-id survivor at
  *      4dp-cosine ≥ 0.35 (the deterministic keep-smallest rule over
  *      the text-kept set, so the prune is one pair scan, not a
  *      fixpoint);
  *   4. report per (lang, source): corpus size, text-stage survivors,
  *      final survivors, and surviving characters.
  *
  * Scale notes: stage 1 is one hash shuffle on the text key (at 100 TB:
  * on a 128-bit content hash, the q60 convention). Stage 3 reuses
  * [[graft.api.VectorOps.cosinePairs]] — the exact O(n²) baseline the
  * oracle can replay (q69 precedent), already cut down by stage 1
  * BEFORE the quadratic join; the 100 TB path swaps in
  * `cosineLshPairs` (identical output contract at the same threshold,
  * q102/q110 precedent, recall measured in RecallAuditSpec) without
  * touching the rest of the pipeline. The per-(lang, source) rollup is
  * one map-side-combinable aggregation over flag columns — the three
  * stage outcomes ride along as 0/1 markers instead of three separate
  * joins of count tables.
  */
object CrossModalQueries {

  private val QualityMinChars = 100L
  private val NearDupCos = 0.35

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q225_crossmodal_prune" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.loadSpread(s, dir, "embeddings")
      // text stage: keep the smallest doc_id of each identical text,
      // then the quality floor. NULL text never survives — made
      // explicit here because Window.partitionBy would group NULLs
      // into one kept partition while the oracle's equi-join drops
      // them (NULL = NULL is not true); the isNotNull filter pins the
      // same drop-NULL semantics in both engines (NullSafetySpec).
      val textKept = docs
        .filter(col("text").isNotNull)
        .withColumn("keep_id",
          min(col("doc_id")).over(Window.partitionBy("text")))
        .filter(col("doc_id") === col("keep_id") &&
          col("n_chars") >= QualityMinChars)
        .select("doc_id")
      // bridge + embedding stage: near-dup pairs among survivors; any
      // id_hi has a smaller-id survivor too close — it gets pruned
      val survivorVecs = emb.join(
        textKept.select(col("doc_id").as("vec_id")), Seq("vec_id"))
      val dupHi = graft.api.VectorOps
        .cosinePairs(survivorVecs, "vec_id", "embedding", NearDupCos)
        .select(col("id_hi").as("doc_id")).distinct()
      docs
        .join(textKept.withColumn("tk", lit(1)), Seq("doc_id"), "left")
        .join(dupHi.withColumn("sd", lit(1)), Seq("doc_id"), "left")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("tk") === 1, 1L).otherwise(0L)).as("n_text_kept"),
          sum(when(col("tk") === 1 && col("sd").isNull, 1L)
            .otherwise(0L)).as("n_final"),
          sum(when(col("tk") === 1 && col("sd").isNull, col("n_chars"))
            .otherwise(0L)).as("chars_final"))
        .orderBy("lang", "source")
    }),

    // The READ path of the same doc_id ↔ vec_id bridge q225 writes
    // through: semantic top-k retrieval restricted to CURATION
    // SURVIVORS (same text stage — exact dedup + quality floor), i.e.
    // "search the cleaned corpus, not the raw one". Probes are the
    // q62 fixed probe set; the corpus is the survivor-filtered
    // embedding table; ranking reuses the broadcast-probe bounded-heap
    // top-k kernel (corpus scanned once, never shuffled; each scan
    // partition contributes ≤ k rows per probe). At 100 TB the brute
    // scan swaps for an IVF index BUILT OVER THE SURVIVORS
    // (graft.sources.IvfIndex, q70 path) — the filter composes with
    // the index build, not with post-hoc result filtering, so pruned
    // docs never cost index space or probe time.
    "q229_crossmodal_search" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.loadSpread(s, dir, "embeddings")
      val textKept = docs
        .filter(col("text").isNotNull)
        .withColumn("keep_id",
          min(col("doc_id")).over(Window.partitionBy("text")))
        .filter(col("doc_id") === col("keep_id") &&
          col("n_chars") >= QualityMinChars)
        .select("doc_id")
      val corpus = emb.join(
        textKept.select(col("doc_id").as("vec_id")), Seq("vec_id"))
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.api.VectorOps.cosineTopK(corpus, "vec_id", "embedding",
          probes, 5)
        .select(col("probe_id"), col("id").as("vec_id"),
          col("cos").as("cos4"), col("rn"))
        .orderBy("probe_id", "rn")
    })
  )

  val oracle: Map[String, String] = Map(
    // same three stages in SQL: min-id-per-text + quality floor, the
    // survivor-only pair scan at the 4dp-rounded cosine threshold
    // (identical association order to the Spark kernel — the q69
    // convention), keep-smallest suppression, flag rollup
    "q225_crossmodal_prune" ->
      s"""WITH k AS (
         |  SELECT d.doc_id
         |  FROM documents d
         |  JOIN (SELECT text, MIN(doc_id) AS keep_id
         |        FROM documents WHERE text IS NOT NULL GROUP BY text) c
         |    ON d.text = c.text AND d.doc_id = c.keep_id
         |  WHERE d.n_chars >= $QualityMinChars),
         |p AS (
         |  SELECT b.vec_id AS doc_id
         |  FROM embeddings a
         |  JOIN embeddings b ON a.vec_id < b.vec_id
         |  JOIN k ka ON ka.doc_id = a.vec_id
         |  JOIN k kb ON kb.doc_id = b.vec_id
         |  WHERE ROUND(${Sql.cosine("a.embedding", "b.embedding")}, 4)
         |          >= $NearDupCos
         |  GROUP BY 1)
         |SELECT d.lang, d.source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN k.doc_id IS NOT NULL
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_text_kept,
         |  CAST(SUM(CASE WHEN k.doc_id IS NOT NULL AND p.doc_id IS NULL
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
         |  CAST(SUM(CASE WHEN k.doc_id IS NOT NULL AND p.doc_id IS NULL
         |           THEN d.n_chars ELSE 0 END) AS BIGINT) AS chars_final
         |FROM documents d
         |LEFT JOIN k ON k.doc_id = d.doc_id
         |LEFT JOIN p ON p.doc_id = d.doc_id
         |GROUP BY 1, 2
         |ORDER BY d.lang ASC NULLS FIRST, d.source ASC NULLS FIRST""".stripMargin,

    // survivor-filtered replay of the q62 brute ranking: the k CTE is
    // the identical text stage, the join restricts the CORPUS side
    // only (probes stay the fixed q62 set)
    "q229_crossmodal_search" -> {
      val sqlCos = Sql.cosine("a.pe", "b.embedding")
      s"""WITH k AS (
         |  SELECT d.doc_id
         |  FROM documents d
         |  JOIN (SELECT text, MIN(doc_id) AS keep_id
         |        FROM documents WHERE text IS NOT NULL GROUP BY text) c
         |    ON d.text = c.text AND d.doc_id = c.keep_id
         |  WHERE d.n_chars >= $QualityMinChars),
         |p AS (SELECT vec_id AS probe_id, embedding AS pe
         |      FROM embeddings WHERE vec_id < 10)
         |SELECT probe_id, vec_id, cos4, rn FROM (
         |  SELECT a.probe_id, b.vec_id,
         |         -- + 0 normalizes a possible -0.0 (Spark round never emits it)
         |         ROUND($sqlCos, 4) + 0 AS cos4,
         |         ROW_NUMBER() OVER (PARTITION BY a.probe_id
         |           ORDER BY ROUND($sqlCos, 4) DESC NULLS LAST,
         |                    b.vec_id ASC NULLS FIRST) AS rn
         |  FROM p a JOIN embeddings b ON b.vec_id != a.probe_id
         |           JOIN k ON k.doc_id = b.vec_id) x
         |WHERE rn <= 5
         |ORDER BY probe_id ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin
    }
  )
}
