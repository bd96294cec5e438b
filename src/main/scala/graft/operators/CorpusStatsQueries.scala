package graft.operators

import graft.{Dets, Tables}
import graft.functions.TextFunctions
import graft.functions.TextFunctions.Sql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.13 corpus-distribution statistics + hybrid retrieval (round 3):
  *
  *  - q112 per-source unigram KL divergence vs the corpus distribution
  *    (domain-shift screening: which collection looks least like the
  *    whole),
  *  - q113 Zipf rank-frequency slope per source (corpus-health check:
  *    natural text sits near −1; generated/boilerplate text flattens),
  *  - q114 first-merge BPE pair counts (the tokenizer-training step:
  *    adjacent character-pair frequencies over the word vocabulary),
  *  - q115 reciprocal-rank-fusion hybrid retrieval (BM25 top-k fused
  *    with embedding-cosine top-k — the standard lexical+dense blend).
  *
  * Scale notes: q112/q113/q114 all collapse token occurrences to the
  * (bounded) vocabulary with map-side partial hash aggs BEFORE any join
  * or ranking — the shuffled row count is vocabulary-sized, not
  * corpus-sized. q113's per-source top-100 runs through the bounded-heap
  * TopKPerGroup operator (k rows per partition shuffled, no window
  * sort). q114 is vocabulary-local: pair explosion happens per DISTINCT
  * word weighted by its corpus count, so a word repeated a billion times
  * costs one row. q115's two rank lists are k-row bounded by
  * construction; the fusion join and final window touch ≤ 2k rows.
  */
object CorpusStatsQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.loadSpread(s, dir, n)

  private def srcTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("source"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))

  private val RrfK = 60
  private val RrfDepth = 50
  private val RrfOut = 20

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KL(P_source ‖ P_corpus) over unigrams: Σ_t p_t · ln(p_t / q_t)
    // with p_t = tf_src/N_src and q_t = tf_corpus/N_corpus. Every token
    // of a source is also in the corpus, so q_t > 0 and no smoothing is
    // needed. Per-type terms are 6dp-quantized and decimal-summed [D2]
    // (order-independent), and the double expression shapes mirror the
    // oracle exactly: p·ln((stf·cn)/(ctf·sn)). Shuffles touch only the
    // (source, token) and token vocabularies; totals attach broadcast.
    "q112_kl_source" -> ((s, dir) => {
      val stf = srcTokens(s, dir).groupBy("source", "tok")
        .agg(count(lit(1)).as("stf"))
      val srcN = stf.groupBy("source").agg(sum("stf").as("sn"))
      val ctf = stf.groupBy("tok").agg(sum("stf").as("ctf"))
      val tot = ctf.agg(sum("ctf").as("cn"))
      stf.join(ctf, "tok").join(broadcast(srcN), "source")
        .crossJoin(broadcast(tot))
        .withColumn("term", round(
          (col("stf").cast("double") / col("sn").cast("double")) *
            log((col("stf").cast("double") * col("cn").cast("double")) /
              (col("ctf").cast("double") * col("sn").cast("double"))), 6)
          .cast(Dec))
        .groupBy("source")
        .agg(count(lit(1)).as("n_types"),
          round(sum(col("term")).cast("double"), 4).as("kl4"))
        .orderBy("source")
    }),

    // Zipf slope per source: OLS fit of ln(count) on ln(rank) over the
    // top-100 tokens (rank order: count desc, token asc — total). The
    // count agg collapses to the vocabulary map-side; the top-100 cut
    // is the bounded-heap operator; the regression sums run over ≤ 100
    // 6dp-quantized decimals per source, so the slope is exact and
    // partition-invariant up to the final double division [D2].
    "q113_zipf_slope" -> ((s, dir) => {
      val cnt = srcTokens(s, dir).groupBy("source", "tok")
        .agg(count(lit(1)).as("cnt"))
      val top = graft.plans.GraftOps.topKPerGroup(cnt, Seq(col("source")),
        Seq(col("cnt").desc, col("tok").asc), 100, rankName = "rk")
      val xy = top.select(col("source"),
        round(log(col("rk").cast("double")), 6).as("x"),
        round(log(col("cnt").cast("double")), 6).as("y"))
      xy.groupBy("source")
        .agg(count(lit(1)).as("n_terms"),
          sum(col("x").cast(Dec)).as("sx"),
          sum(col("y").cast(Dec)).as("sy"),
          sum(round(col("x") * col("y"), 6).cast(Dec)).as("sxy"),
          sum(round(col("x") * col("x"), 6).cast(Dec)).as("sxx"))
        .select(col("source"), col("n_terms"),
          round(safeDiv(
            col("n_terms").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"),
            col("n_terms").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")), 4)
            .as("slope4"))
        .orderBy("source")
    }),

    // First BPE merge step: adjacent character-pair counts over the word
    // vocabulary, each pair weighted by its word's corpus frequency —
    // top-20 pairs (count desc, pair asc). The occurrence → vocabulary
    // collapse happens FIRST, so the pair explosion is per distinct
    // word; the global top-20 compiles to TakeOrderedAndProject.
    "q114_bpe_pairs" -> ((s, dir) => {
      val words = srcTokens(s, dir).groupBy(col("tok").as("w"))
        .agg(count(lit(1)).as("wcnt"))
        .filter(length(col("w")) >= 2)
      words.select(col("wcnt"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy("pair")
        .agg(sum("wcnt").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(20)
    }),

    // Hybrid retrieval by reciprocal-rank fusion: the pinned BM25 query
    // (q94's term bag) and a pinned dense probe (embedding of vec_id 0,
    // embeddings align 1:1 with doc_ids) each produce a depth-50 rank
    // list; fused score = Σ 1/(60 + rank) over the lists a doc appears
    // in, top-20 by fused score (doc_id tie-break). The whole
    // composition IS the EtlService retrieval endpoint — one
    // implementation, two gated parameter bindings (this and q117).
    "q115_hybrid_rrf" -> ((s, dir) =>
      new graft.api.EtlService(s).searchDocuments(
        t(s, dir, "documents"), t(s, dir, "embeddings"),
        TfidfQueries.Bm25Terms, probeId = 0L, depth = RrfDepth,
        k = RrfOut, rrfK = RrfK))
  )

  private val sqlToks = Sql.tokens("text")

  val oracle: Map[String, String] = Map(
    "q112_kl_source" ->
      s"""WITH st AS (
         |  SELECT source, tok, COUNT(*) AS stf
         |  FROM (SELECT source, unnest($sqlToks) AS tok FROM documents) x
         |  GROUP BY source, tok
         |), sn AS (SELECT source, SUM(stf) AS sn FROM st GROUP BY source),
         |ct AS (SELECT tok, SUM(stf) AS ctf FROM st GROUP BY tok),
         |tt AS (SELECT SUM(ctf) AS cn FROM ct)
         |SELECT st.source, COUNT(*) AS n_types,
         |       ROUND(CAST(SUM(CAST(ROUND(
         |         (CAST(stf AS DOUBLE) / CAST(sn AS DOUBLE))
         |         * ln((CAST(stf AS DOUBLE) * CAST(cn AS DOUBLE))
         |              / (CAST(ctf AS DOUBLE) * CAST(sn AS DOUBLE))), 6)
         |         AS DECIMAL(38,6))) AS DOUBLE), 4) AS kl4
         |FROM st JOIN ct USING (tok) JOIN sn USING (source) CROSS JOIN tt
         |GROUP BY st.source
         |ORDER BY source ASC NULLS FIRST""".stripMargin,

    "q113_zipf_slope" ->
      s"""WITH c AS (
         |  SELECT source, tok, COUNT(*) AS cnt
         |  FROM (SELECT source, unnest($sqlToks) AS tok FROM documents) x
         |  GROUP BY source, tok
         |), top AS (
         |  SELECT source, cnt,
         |         ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY cnt DESC NULLS LAST, tok ASC NULLS FIRST) AS rk
         |  FROM c
         |  QUALIFY rk <= 100
         |), xy AS (
         |  SELECT source, ROUND(ln(CAST(rk AS DOUBLE)), 6) AS x,
         |         ROUND(ln(CAST(cnt AS DOUBLE)), 6) AS y
         |  FROM top
         |), s AS (
         |  SELECT source, COUNT(*) AS n_terms,
         |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         |         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
         |         CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         |         CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxx
         |  FROM xy GROUP BY source)
         |SELECT source, n_terms,
         |       ROUND(CASE WHEN CAST(n_terms AS DOUBLE) * sxx - sx * sx != 0
         |         THEN (CAST(n_terms AS DOUBLE) * sxy - sx * sy)
         |              / (CAST(n_terms AS DOUBLE) * sxx - sx * sx) END, 4)
         |         AS slope4
         |FROM s ORDER BY source ASC NULLS FIRST""".stripMargin,

    "q114_bpe_pairs" ->
      s"""WITH w AS (
         |  SELECT tok AS w, COUNT(*) AS wcnt
         |  FROM (SELECT unnest($sqlToks) AS tok FROM documents) x
         |  GROUP BY tok
         |  HAVING length(tok) >= 2
         |), p AS (
         |  SELECT unnest(list_transform(range(1, length(w)),
         |           i -> substr(w, CAST(i AS INT), 2))) AS pair, wcnt
         |  FROM w)
         |SELECT pair, CAST(SUM(wcnt) AS BIGINT) AS cnt
         |FROM p GROUP BY pair
         |ORDER BY cnt DESC NULLS LAST, pair ASC NULLS FIRST
         |LIMIT 20""".stripMargin,

    "q115_hybrid_rrf" -> {
      val cosSql = Sql.cosine("p.pe", "b.embedding")
      s"""WITH ${TfidfQueries.bm25RankCteSql(excludeId = Some(0L))},
         |bm AS (SELECT id, rank AS r_bm FROM bmr WHERE rank <= $RrfDepth),
         |p AS (SELECT vec_id AS probe_id, embedding AS pe
         |      FROM embeddings WHERE vec_id = 0),
         |cr AS (
         |  SELECT id, rn AS r_cos FROM (
         |    SELECT b.vec_id AS id,
         |           ROW_NUMBER() OVER (
         |             ORDER BY ROUND($cosSql, 4) DESC NULLS LAST,
         |                      b.vec_id ASC NULLS FIRST) AS rn
         |    FROM p CROSS JOIN embeddings b
         |    WHERE b.vec_id != p.probe_id) x
         |  WHERE rn <= $RrfDepth
         |), f AS (
         |  SELECT COALESCE(bm.id, cr.id) AS doc_id, bm.r_bm, cr.r_cos,
         |         ROUND(COALESCE(1.0 / ($RrfK + CAST(bm.r_bm AS DOUBLE)), 0)
         |             + COALESCE(1.0 / ($RrfK + CAST(cr.r_cos AS DOUBLE)), 0), 6)
         |           AS rrf6
         |  FROM bm FULL OUTER JOIN cr ON bm.id = cr.id)
         |SELECT doc_id, r_bm, r_cos, rrf6,
         |       CAST(ROW_NUMBER() OVER (ORDER BY rrf6 DESC NULLS LAST,
         |                               doc_id ASC NULLS FIRST) AS INT) AS rank
         |FROM f
         |QUALIFY rank <= $RrfOut
         |ORDER BY rank ASC NULLS FIRST""".stripMargin
    }
  )
}
