package graft.operators

import graft.Tables
import graft.functions.{GraftFunctions, TextFunctions}
import graft.functions.TextFunctions.Sql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF scoring (q75) and word-bigram shingle Jaccard (q76) — the
  * remaining text-relevance / n-gram-dedup operators from the inventory.
  *
  * Scale notes: q75 is two hash aggregations (term frequency per doc,
  * document frequency per term) joined on the term — both partial
  * -aggregate map-side; the corpus-size scalar joins in via a broadcast
  * single-row aggregate, never a driver-side collect. q76 reuses the
  * sorted-hash merge-intersect expression; shingle sets are ~doc-length
  * sized, and the same-lang blocking + LSH (q66) is the scale path.
  */
object TfidfQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.loadSpread(s, dir, n)

  /** The retrieval family's one shared primitive: the per-(doc, term)
    * frequency table (doc_id, w, tf) from ONE tokenize + explode +
    * map-side-partial aggregation pass, memoized per (session, dir)
    * and primed under its own bench line (shared:tfidf_doctf — guide
    * §2.4 share-keyed work). Before r15 seven keys each re-ran the
    * corpus tokenize: q75's tf, q95/q139's tokenSet explode (the
    * distinct (doc, w) pairs ARE this table's keys), q379's
    * (cf = Σ tf, df = row count) grid, q342's df histogram and the
    * q266/q309/q337 known-item chain's tf/dl. Derivations are exact:
    * count-over-instances == sum(tf), countDistinct(doc) == row count
    * per term, dl == Σ tf per doc — same values, same int64. */
  private[graft] def docTf(s: SparkSession, dir: String): DataFrame =
    graft.Caches.memo(s, s"tfidf.doctf:$dir") {
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    }

  private[operators] val Bm25Terms = Seq("hash", "join", "scan")
  /** q362's Dirichlet-QLM μ (Zhai & Lafferty's recommended ~2000);
    * declared up here with the term bag — the oracle map below
    * interpolates it at object init, so it must precede the map. */
  private[operators] val QlmMu: Double = 2000.0
  /** q379's top-k cut (by collection frequency). */
  private[operators] val BurstK = 15
  private[operators] val Bm25K = 50
  private[operators] val K1 = 1.2
  private[operators] val B = 0.75
  private val IdxMinDf = 5L

  /** q266 known-item eval geometry: MrrProbes probe documents (spread-
    * hash draw over docs with ≥ MrrQTerms tokens), MrrQTerms query
    * terms per probe (top in-doc tf, token ties ascending). */
  private val MrrProbes = 10
  private val MrrQTerms = 3

  /** q139's conjunctive term bag. */
  private val BoolTerms = Seq("hash", "join", "scan")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_tfidf" -> ((s, dir) =>
      graft.api.TextOps.tfidfTopTermsOfTf(
        docTf(s, dir).select(col("doc_id").as("__id"),
          col("w").as("tok"), col("tf").as("cnt")),
        t(s, dir, "documents").agg(count(lit(1)).as("n_docs")))
        .select(col("id").as("doc_id"), col("top_term"),
          col("tfidf").as("tfidf4"))
        .orderBy("doc_id")),

    // graft_bigram_hashes folds each "a b" shingle directly to its hash
    // (no concatenated-string materialization, no interpreted lambdas);
    // distinct-of-hashes equals hashes-of-distinct-grams because the
    // rolling hash is collision-free on the corpus shingles (asserted in
    // OperatorSpec, and the q76 oracle replays the gram-set form).
    "q76_ngram_jaccard" -> ((s, dir) =>
      graft.api.TextOps.ngramJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", "lang", 0.25)
        .select(col("id_lo"), col("id_hi"), round(col("jac"), 4).as("jac4"))
        .orderBy("id_lo", "id_hi")),

    // Inverted-index build: per term, document frequency + the sorted
    // posting list — the retrieval-side ETL artifact BM25/TF-IDF serve
    // from. One distinct-reduce and one hash agg, both map-side partial;
    // sort_array pins posting order [D1]. At 100 TB posting lists stop
    // being row values: the same (term, doc) reduction is written
    // term-bucketed/sorted (LakeWriter bucketing) and df alone stays
    // relational — the declared query keeps the df floor high enough
    // that emitted lists stay bounded. Postings are emitted comma-joined
    // (the q27 pattern: integers render identically in both engines) so
    // the driver's value hash sees a scalar, not an array.
    "q95_inverted_index" -> ((s, dir) => {
      // the memoized (doc, term) table's keys ARE the tokenSet pairs
      val posting = docTf(s, dir)
        .select(col("w").as("term"), col("doc_id"))
      posting.groupBy("term")
        .agg(count(lit(1)).as("df"),
          sort_array(collect_list(col("doc_id"))).as("postings"))
        .filter(col("df") >= IdxMinDf)
        .select(col("term"), col("df"),
          expr("array_join(transform(postings, x -> CAST(x AS STRING)), ',')")
            .as("postings_csv"))
        .orderBy("term")
    }),

    // Exact boolean AND retrieval — the query-EVAL counterpart of the
    // q95 index build (BM25 ranks; this answers the strict conjunctive
    // predicate a filter pipeline needs). Distinct (doc, term) hits for
    // the pinned bag collapse map-side; a doc qualifies iff its hit
    // count equals the bag size. No index structure is materialized —
    // at 100 TB the same count==|terms| reduction runs over the
    // term-bucketed posting lake q95 describes.
    "q139_bool_search" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val hits = docTf(s, dir)
        .filter(col("w").isin(BoolTerms: _*))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
        .filter(col("n_hit") === BoolTerms.size)
      docs.select(col("doc_id"), col("lang"), col("source"))
        .join(hits.select("doc_id"), Seq("doc_id"))
        .orderBy("doc_id")
    }),

    // BM25 retrieval scoring for a pinned query-term bag: tf per term by
    // native array arithmetic (no explode), corpus stats as a one-row
    // broadcast, bounded-heap top-k — the whole query is a map + a
    // one-row reduce + a k-row merge.
    "q94_bm25" -> ((s, dir) =>
      graft.api.TextOps.bm25(
        t(s, dir, "documents"), "doc_id", "text", Bm25Terms, Bm25K, K1, B)
        .select(col("id").as("doc_id"), col("score4"), col("rank"))
        .orderBy("rank")),

    // Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    // 2001/2004, public method) for the pinned q94 term bag — the
    // LANGUAGE-MODEL ranking next to BM25's tf-idf one (the two
    // standard lexical baselines; their rank disagreement is exactly
    // the length-normalization story). Matched-form scoring:
    // score(d) = Σ_q ln(1 + tf·|C|/(μ·cf_q)) + |q|·ln(μ/(dl+μ)) —
    // only matched terms contribute to the sum, so nothing explodes;
    // tf by native array arithmetic (the q94 no-explode trick),
    // collection stats one broadcast row, per-term logs 6dp-quantized
    // + decimal-summed [D2], bounded-heap top-k on the exact decimal
    // [D3]. A zero-collection-frequency term contributes nothing
    // (guarded — a pinned vocabulary can miss a shard at 100 TB).
    "q362_dirichlet_qlm" -> ((s, dir) => {
      val terms = Bm25Terms
      val base = t(s, dir, "documents").select(col("doc_id").as("id"),
          TextFunctions.tokens(col("text")).as("tk"))
        .withColumn("dl", size(col("tk")).cast("long"))
      val withTf = terms.indices.foldLeft(base) { (d, i) =>
        d.withColumn(s"tf_$i", (size(col("tk")) -
          size(array_remove(col("tk"), lit(terms(i))))).cast("long"))
      }.drop("tk")
      val stats = withTf.agg(sum(col("dl")).as("c_len"),
        terms.indices.map(i => sum(col(s"tf_$i")).as(s"cf_$i")): _*)
      val scored = withTf
        .filter(terms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
        .crossJoin(broadcast(stats))
      val termScores = terms.indices.map { i =>
        round(when(col(s"cf_$i") > 0,
          log(lit(1.0) + col(s"tf_$i").cast("double")
            * col("c_len").cast("double")
            / (lit(QlmMu) * col(s"cf_$i").cast("double"))))
          .otherwise(lit(0.0)), 6).cast(graft.Dets.Dec)
      }
      val lenTerm = round(lit(terms.size.toDouble)
        * log(lit(QlmMu) / (col("dl").cast("double") + lit(QlmMu))), 6)
        .cast(graft.Dets.Dec)
      val dec = scored.withColumn("score_dec",
        (termScores :+ lenTerm).reduce(_ + _))
      graft.plans.GraftOps.topKPerGroup(dec, Seq(lit(1)),
        Seq(col("score_dec").desc, col("id").asc), Bm25K,
        rankName = "rank")
        .select(col("id").as("doc_id"),
          round(col("score_dec").cast("double"), 4).as("score4"),
          col("rank").cast("int").as("rank"))
        .orderBy("rank")
    }),

    // Term burstiness vs the Poisson baseline (Church & Gale 1995,
    // public method) — the "does this word CLUMP into few documents"
    // readout behind stopword cuts and topicality weighting (q342
    // profiles the df distribution; this scores each term against
    // what a non-bursty corpus WOULD show): for the top-15 terms by
    // collection frequency, observed df vs the Poisson-expected
    // E[df] = D·(1 − e^(−cf/D)), and burstiness = expected/observed
    // (> 1 ⇔ the term clumps). One (term) hash agg + a one-row doc
    // count broadcast; exp/ratio are one shared-string IEEE tree
    // each (BurstFormula); ranking by exact integer cf through the
    // bounded heap [D3].
    "q379_term_burstiness" -> ((s, dir) => {
      // cf = Σ tf (instance count), df = rows per term (distinct docs)
      val tf = docTf(s, dir)
        .groupBy(col("w").as("term"))
        .agg(sum(col("tf")).as("cf"), count(lit(1)).as("df"))
      val dd = t(s, dir, "documents").agg(count(lit(1)).as("d"))
      val top = graft.plans.GraftOps.topKPerGroup(
        tf.crossJoin(broadcast(dd)), Seq(lit(1)),
        Seq(col("cf").desc, col("term").asc), BurstK, rankName = "rk")
      top.select(col("term"), col("cf"), col("df"),
          expr(BurstFormula.edf4).as("exp_df4"),
          expr(BurstFormula.burst4).as("burst4"))
        .orderBy(col("cf").desc, col("term").asc)
    }),

    "q204_phrase_search" -> ((s, dir) => phraseSearch(s, dir)),

    // Known-item-search MRR (round 10) — the retrieval family's EVAL
    // (q249 measures the classifier, q253 the recommender, q255 the
    // LSH sketch; this measures BM25): for each of MrrProbes
    // deterministic probe documents, the query is the probe's own top
    // MrrQTerms terms and the relevant answer is the probe itself —
    // the standard known-item protocol when no human judgments exist.
    // Scoring is the q94 BM25 formula made RELATIONAL (terms as rows,
    // so the query bag is data-dependent — per-term scores
    // 6dp-quantized and decimal-summed per (probe, doc) [D2]); the
    // self-rank is the 1 + count-of-better form ((score, id)
    // lexicographic, no per-probe full sort), rr_pm the [D5]
    // truncating reciprocal. Per-probe rows; MRR is their mean. At
    // 100 TB the postings join carries only the ≤ probes × terms
    // query vocabulary.
    "q266_known_item_mrr" -> ((s, dir) =>
      knownItemRanks(s, dir)
        .select(col("probe").as("probe_doc"), col("n_results"),
          col("rank_self"),
          expr("1000L div rank_self").as("rr_pm"))
        .orderBy("probe_doc")),

    // NDCG@10 for the same known-item protocol — the GRADED-discount
    // companion of q266's MRR (MRR charges 1/rank; NDCG's 1/log2(1+r)
    // discount is the reporting standard for ranked retrieval, and
    // with a single relevant item the ideal DCG is 1 so NDCG@k =
    // 1/log2(1+rank) inside the cutoff, 0 past it). One row: probe
    // count, hits inside the cutoff, and the mean NDCG with per-probe
    // gains 6dp-quantized + decimal-summed [D2] — ln-ratio form
    // (ln 2 / ln(1+r)), no log2 to diverge between engines.
    "q309_ndcg" -> ((s, dir) =>
      knownItemRanks(s, dir)
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("rank_self") <= NdcgK, 1L).otherwise(0L))
            .as("hits_at_10"),
          sum(when(col("rank_self") <= NdcgK,
            round(log(lit(2.0))
              / log((col("rank_self") + 1).cast("double")), 6))
            .otherwise(lit(0.0)).cast(graft.Dets.Dec)).as("sg"))
        .select(col("n_probes"), col("hits_at_10"),
          round(col("sg").cast("double")
            / col("n_probes").cast("double"), 6).as("ndcg6"))),

    // Success@k curve — the CUTOFF SWEEP the single-k metrics hide
    // (q266 charges 1/rank, q309 fixes k = 10; an index tuner reads
    // the whole success curve to pick the serving cutoff): at k ∈
    // {1,3,5,10,20}, how many probes rank their own document inside
    // the cutoff. One agg row of conditional sums over the memoized
    // rank chain, unpivoted to the 5-row curve; success_pm the [D5]
    // truncating permille. No join, no second rank pass.
    "q337_success_curve" -> ((s, dir) => {
      val aggs = count(lit(1)).as("n_probes") +:
        SuccessKs.map(k => sum(when(col("rank_self") <= k, 1L)
          .otherwise(0L)).as(s"h$k"))
      knownItemRanks(s, dir).agg(aggs.head, aggs.tail: _*)
        .selectExpr(
          s"stack(${SuccessKs.size}, " +
            SuccessKs.map(k => s"$k, h$k").mkString(", ") +
            ") as (k, hits)",
          "n_probes")
        .select(col("k"), col("n_probes"), col("hits"),
          expr("1000 * hits div n_probes").as("success_pm"))
        .orderBy("k")
    }),

    // Postings-list skew census — the index-ops health table behind
    // every retrieval key here (q94/q95/q139/q204): vocabulary size,
    // total postings, the df distribution's p50/p90/p99/max, and the
    // share of postings held by the 10 most common terms — the
    // numbers that decide stopword cuts, impact-ordered early
    // termination, and whether a hot posting list needs splitting.
    // The df relation collapses to its VALUE HISTOGRAM before the
    // global cumulative (GlobalRank.cumSum — never a term sort);
    // percentiles are q44-style rank picks; the top-10 mass is a
    // bounded-heap cut; the share a [D5] truncating permille.
    "q342_postings_skew" -> ((s, dir) => {
      val dfr = docTf(s, dir)
        .groupBy("w").agg(count(lit(1)).as("df"))
      val hist = dfr.groupBy("df").agg(count(lit(1)).as("cnt"))
        .withColumn("gg", lit(1))
      val r = graft.functions.GlobalRank.cumSum(hist, "gg", "df", "cnt")
      val pick = r.agg(
        sum(col("cnt")).as("n_terms"),
        sum(col("df") * col("cnt")).as("n_postings"),
        min(when(col("cum") * 2 >= col("n"), col("df"))).as("df_p50"),
        min(when(col("cum") * 10 >= col("n") * 9, col("df")))
          .as("df_p90"),
        min(when(col("cum") * 100 >= col("n") * 99, col("df")))
          .as("df_p99"),
        max(col("df")).as("df_max"))
      val top = dfr.orderBy(col("df").desc, col("w").asc).limit(10)
        .agg(sum(col("df")).as("top10"))
      pick.crossJoin(broadcast(top))
        .select(col("n_terms"), col("n_postings"), col("df_p50"),
          col("df_p90"), col("df_p99"), col("df_max"),
          expr("1000 * top10 div n_postings").as("top10_pm"))
    })
  )

  /** q337's cutoff sweep. */
  private val SuccessKs = Seq(1, 3, 5, 10, 20)

  /** q309's rank cutoff. */
  private val NdcgK = 10

  /** The shared known-item BM25 ranking (q266/q309): deterministic
    * polyMix probe draw, per-probe top-tf query bags, the relational
    * q94 BM25 scoring (6dp-quantized decimal-summed terms [D2]), and
    * the 1 + count-of-better self-rank on the (score, id) total order.
    * Memoized per (session, dir) — both consumers read one build. */
  private def knownItemRanks(s: SparkSession, dir: String): DataFrame =
    graft.Caches.memo(s, s"kir:$dir:$MrrProbes:$MrrQTerms") {
      // tf is the memoized shared table; dl = Σ tf per doc (the token
      // instance count) — same values the explode recount produced
      val tf = docTf(s, dir)
      val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl"))
      val dfr = tf.groupBy("w").agg(count(lit(1)).as("df"))
      // probe draw via the house polyMix convention: the id is reduced
      // into [0, M) BEFORE any multiply, so the draw is identical on
      // every engine at any id magnitude (a bare id * spread product
      // wraps silently in Spark but overflows loudly in DuckDB past
      // ~3.5e9 — exactly the scale this query targets)
      val probes = dl.filter(col("dl") >= MrrQTerms)
        .select(col("doc_id").as("probe"),
          GraphQueries.polyMix(pmod(col("doc_id"),
            lit(GraphQueries.HashM))).as("h"))
        .orderBy(col("h").asc, col("probe").asc).limit(MrrProbes)
      val qt = tf.join(probes, tf("doc_id") === probes("probe"))
        .withColumn("rn", row_number().over(Window.partitionBy("probe")
          .orderBy(col("tf").desc, col("w").asc)))
        .filter(col("rn") <= MrrQTerms)
        .select(col("probe"), col("w"))
      val scored = broadcast(qt)
        .join(tf.select(col("w"), col("doc_id").as("id"), col("tf")),
          Seq("w"))
        .join(dl.select(col("doc_id").as("id"), col("dl")), Seq("id"))
        .join(dfr, Seq("w"))
        .crossJoin(broadcast(stats))
        .withColumn("avgdl",
          col("sum_dl").cast("double") / col("n_docs"))
        .withColumn("ts", round(
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
            * (col("tf").cast("double") * lit(K1 + 1))
            / (col("tf").cast("double") + lit(K1) * (lit(1 - B)
              + lit(B) * col("dl").cast("double") / col("avgdl"))), 6)
          .cast(graft.Dets.Dec))
        .groupBy("probe", "id").agg(sum(col("ts")).as("score_dec"))
      val self = scored.filter(col("probe") === col("id"))
        .select(col("probe"), col("score_dec").as("sscore"))
      scored.join(broadcast(self), Seq("probe"))
        .groupBy("probe")
        .agg(count(lit(1)).as("n_results"),
          (sum(when(col("score_dec") > col("sscore")
            || (col("score_dec") === col("sscore")
              && col("id") < col("probe")), 1L).otherwise(0L)) + 1L)
            .as("rank_self"))
    }

  /** q204's pinned phrase — consecutive tokens, in order. */
  private val PhraseTerms = Seq("stream", "table", "hash")

  /** Exact phrase retrieval — the POSITIONAL counterpart of q139's
    * boolean AND: a document qualifies only where the three tokens are
    * adjacent and in order. Positions come from one posexplode pass;
    * each phrase word's postings shift left by its offset so the match
    * is a plain (doc_id, pos) equi-join of three tiny filtered postings
    * — the distributed positional-index probe, no array re-scan per
    * candidate and nothing quadratic.
    */
  private def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pos = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "w")))
    def posting(i: Int): DataFrame = pos
      .filter(col("w") === PhraseTerms(i))
      .select(col("doc_id"), (col("pos") - i).as("pos"))
    val occ = posting(0).join(posting(1), Seq("doc_id", "pos"))
      .join(posting(2), Seq("doc_id", "pos"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
    docs.select("doc_id", "lang", "source")
      .join(occ, Seq("doc_id"))
      .orderBy("doc_id")
  }

  private val sqlToks = Sql.tokens("text")

  val oracle: Map[String, String] = Map(
    "q139_bool_search" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(${Sql.tokenSet("text")}) AS w
         |  FROM documents
         |), hit AS (
         |  SELECT doc_id FROM tk
         |  WHERE w IN (${BoolTerms.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY doc_id HAVING COUNT(*) = ${BoolTerms.size})
         |SELECT d.doc_id, d.lang, d.source
         |FROM documents d JOIN hit USING (doc_id)
         |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "q75_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($sqlToks) AS tok FROM documents
         |), tf AS (
         |  SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY doc_id, tok
         |), df AS (
         |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
         |), n AS (SELECT COUNT(*) AS n_docs FROM documents)
         |SELECT doc_id, tok AS top_term,
         |       ROUND(cnt * LN(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf4
         |FROM tf JOIN df USING (tok) CROSS JOIN n
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
         |  ORDER BY ROUND(cnt * LN(CAST(n_docs AS DOUBLE) / df), 4) DESC NULLS LAST,
         |           tok ASC NULLS FIRST) = 1
         |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "q76_ngram_jaccard" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |         list_distinct(list_transform(range(1, len(tk)),
         |           i -> tk[i] || ' ' || tk[i + 1])) AS grams
         |  FROM (SELECT doc_id, lang, $sqlToks AS tk FROM documents) x
         |  WHERE len(tk) >= 2
         |)
         |SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
         |       ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |             / len(list_distinct(a.grams || b.grams)), 4) AS jac4
         |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |      / len(list_distinct(a.grams || b.grams)) >= 0.25
         |ORDER BY id_lo ASC NULLS FIRST, id_hi ASC NULLS FIRST""".stripMargin,

    "q95_inverted_index" ->
      s"""WITH p AS (
         |  SELECT doc_id, unnest(${Sql.tokenSet("text")}) AS term
         |  FROM documents
         |)
         |SELECT term, COUNT(*) AS df,
         |       array_to_string(list(doc_id ORDER BY doc_id ASC), ',')
         |         AS postings_csv
         |FROM p GROUP BY term
         |HAVING COUNT(*) >= $IdxMinDf
         |ORDER BY term ASC NULLS FIRST""".stripMargin,

    // Same tf/idf/length-normalization expression tree as the Spark op:
    // per-term scores quantized to 6dp, decimal-summed, ranked by the
    // exact decimal with doc_id tie-break.
    "q94_bm25" ->
      s"""WITH ${bm25RankCteSql()}
         |SELECT id AS doc_id, score4, rank FROM bmr
         |WHERE rank <= $Bm25K
         |ORDER BY rank ASC NULLS FIRST""".stripMargin,

    // the same (cf, df) grid + doc-count attach, SAME Poisson trees,
    // ROW_NUMBER heap mirror on the exact integer cf
    "q379_term_burstiness" ->
      s"""WITH tf AS (
         |  SELECT term, CAST(COUNT(*) AS BIGINT) AS cf,
         |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM (SELECT doc_id, unnest($sqlToks) AS term
         |        FROM documents) x
         |  GROUP BY 1),
         |dd AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM documents),
         |top AS (
         |  SELECT term, cf, df, d FROM (
         |    SELECT tf.*, dd.d, ROW_NUMBER() OVER (
         |      ORDER BY cf DESC NULLS LAST, term ASC NULLS FIRST) AS rk
         |    FROM tf CROSS JOIN dd) z
         |  WHERE rk <= $BurstK)
         |SELECT term, cf, df,
         |       ${BurstFormula.edf4} AS exp_df4,
         |       ${BurstFormula.burst4} AS burst4
         |FROM top
         |ORDER BY cf DESC NULLS LAST, term ASC NULLS FIRST""".stripMargin,

    // same tf columns + collection-stat row, the SAME matched-form
    // Dirichlet trees (per-term 6dp decimal terms + the length term),
    // rank by the exact decimal with id tie-break
    "q362_dirichlet_qlm" ->
      s"""WITH ${qlmRankCteSql()}
         |SELECT id AS doc_id, score4, rank FROM qr
         |WHERE rank <= $Bm25K
         |ORDER BY rank ASC NULLS FIRST""".stripMargin,

    "q204_phrase_search" ->
      s"""WITH tk AS (
         |  SELECT doc_id, $sqlToks AS toks FROM documents),
         |occ AS (
         |  SELECT doc_id, COUNT(*) AS n_occ
         |  FROM tk, UNNEST(generate_series(1, len(toks) - 2)) AS t(i)
         |  WHERE toks[i] = '${PhraseTerms(0)}'
         |    AND toks[i + 1] = '${PhraseTerms(1)}'
         |    AND toks[i + 2] = '${PhraseTerms(2)}'
         |  GROUP BY doc_id)
         |SELECT d.doc_id, d.lang, d.source, n_occ
         |FROM documents d JOIN occ USING (doc_id)
         |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    // the known-item replay: identical spread-hash probe draw, top-tf
    // query bags, the q94 BM25 formula with terms as ROWS, the same
    // 6dp decimal per-term staging and count-of-better self-rank
    "q266_known_item_mrr" ->
      s"""$knownItemRankCteSql
         |SELECT probe AS probe_doc, n_results, rank_self,
         |       CAST(1000 // rank_self AS BIGINT) AS rr_pm
         |FROM r
         |ORDER BY probe_doc ASC NULLS FIRST""".stripMargin,

    // the same rank chain; ln-ratio discount, 6dp gains decimal-summed
    "q309_ndcg" ->
      s"""$knownItemRankCteSql
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         |       CAST(SUM(CASE WHEN rank_self <= $NdcgK THEN 1 ELSE 0 END)
         |         AS BIGINT) AS hits_at_10,
         |       ROUND(CAST(SUM(CAST(CASE WHEN rank_self <= $NdcgK
         |           THEN ROUND(LN(2.0)
         |             / LN(CAST(rank_self + 1 AS DOUBLE)), 6)
         |           ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
         |         / CAST(COUNT(*) AS DOUBLE), 6) AS ndcg6
         |FROM r""".stripMargin,

    // the same rank chain; one conditional-sum row unpivoted to the
    // 5-row curve, [D5] truncating permille
    "q337_success_curve" -> {
      val hs = SuccessKs.map(k =>
        s"SUM(CASE WHEN rank_self <= $k THEN 1 ELSE 0 END) AS h$k")
        .mkString(",\n         |         ")
      val rows = SuccessKs.map(k =>
        s"SELECT CAST($k AS INT) AS k, n_probes, h$k AS hits FROM a")
        .mkString("\n         |  UNION ALL ")
      s"""$knownItemRankCteSql,
         |a AS (
         |  SELECT COUNT(*) AS n_probes,
         |         $hs
         |  FROM r),
         |curve AS (
         |  $rows)
         |SELECT k, CAST(n_probes AS BIGINT) AS n_probes,
         |       CAST(hits AS BIGINT) AS hits,
         |       CAST(1000 * hits // n_probes AS BIGINT) AS success_pm
         |FROM curve
         |ORDER BY k ASC NULLS FIRST""".stripMargin
    },

    // the skew replay: same df histogram, window cumulative, rank
    // picks, bounded top-10 cut, truncating permille
    "q342_postings_skew" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($sqlToks) AS w FROM documents),
         |tf AS (SELECT doc_id, w FROM toks GROUP BY 1, 2),
         |dfr AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
         |hist AS (SELECT df, COUNT(*) AS cnt FROM dfr GROUP BY 1),
         |r AS (
         |  SELECT df, cnt, SUM(cnt) OVER (ORDER BY df) AS cum,
         |         SUM(cnt) OVER () AS n
         |  FROM hist),
         |pick AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_terms,
         |         CAST(SUM(df * cnt) AS BIGINT) AS n_postings,
         |         MIN(CASE WHEN cum * 2 >= n THEN df END) AS df_p50,
         |         MIN(CASE WHEN cum * 10 >= n * 9 THEN df END) AS df_p90,
         |         MIN(CASE WHEN cum * 100 >= n * 99 THEN df END)
         |           AS df_p99,
         |         MAX(df) AS df_max
         |  FROM r),
         |top AS (
         |  SELECT CAST(SUM(df) AS BIGINT) AS top10 FROM (
         |    SELECT df FROM dfr ORDER BY df DESC, w ASC LIMIT 10) z)
         |SELECT n_terms, n_postings, df_p50, df_p90, df_p99, df_max,
         |       CAST(1000 * top10 // n_postings AS BIGINT) AS top10_pm
         |FROM pick, top""".stripMargin
  )

  /** The shared CTE chain of the q266/q309 oracles, ending in
    * `r(probe, n_results, rank_self)` — one ranking-replay definition
    * for both metrics to gate. */
  private def knownItemRankCteSql: String =
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($sqlToks) AS w FROM documents),
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
         |st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
         |       FROM dl),
         |sa AS (SELECT *, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl FROM st),
         |dfr AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
         |pr AS (
         |  SELECT doc_id AS probe,
         |         ${GraphQueries.polyMixSql(
              s"((doc_id % ${GraphQueries.HashM}) + ${GraphQueries.HashM})" +
                s" % ${GraphQueries.HashM}")} AS h
         |  FROM dl WHERE dl >= $MrrQTerms
         |  ORDER BY h ASC, probe ASC LIMIT $MrrProbes),
         |qt AS (
         |  SELECT probe, w FROM (
         |    SELECT p.probe, t.w, ROW_NUMBER() OVER (PARTITION BY p.probe
         |      ORDER BY t.tf DESC, t.w ASC) AS rn
         |    FROM pr p JOIN tf t ON t.doc_id = p.probe) z
         |  WHERE rn <= $MrrQTerms),
         |sc AS (
         |  SELECT q.probe, t.doc_id AS id,
         |         CAST(SUM(CAST(ROUND(
         |           LN(1.0 + (CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
         |                    / (CAST(d.df AS DOUBLE) + 0.5))
         |           * (CAST(t.tf AS DOUBLE) * ${K1 + 1})
         |           / (CAST(t.tf AS DOUBLE) + $K1 * (${1 - B}
         |              + $B * CAST(l.dl AS DOUBLE) / s.avgdl)), 6)
         |           AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS score_dec
         |  FROM qt q JOIN tf t ON t.w = q.w
         |  JOIN dl l ON l.doc_id = t.doc_id
         |  JOIN dfr d ON d.w = q.w
         |  CROSS JOIN sa s
         |  GROUP BY 1, 2),
         |sf AS (SELECT probe, score_dec AS sscore FROM sc
         |       WHERE probe = id),
         |r AS (
         |  SELECT s.probe, COUNT(*) AS n_results,
         |         CAST(SUM(CASE WHEN s.score_dec > f.sscore
         |              OR (s.score_dec = f.sscore AND s.id < s.probe)
         |              THEN 1 ELSE 0 END) + 1 AS BIGINT) AS rank_self
         |  FROM sc s JOIN sf f USING (probe)
         |  GROUP BY 1)""".stripMargin

  /** CTE chain ending in `bmr(id, score4, rank)` — the exact BM25 ranking
    * replay (decimal-summed 6dp per-term scores, score-then-id total
    * order), parameterized on the term bag. Shared by the q94 oracle,
    * q115's hybrid-RRF oracle, and q117's service-endpoint oracle so all
    * gate one definition. `excludeId` mirrors searchDocuments' probe-doc
    * exclusion — it filters BEFORE the corpus stats, exactly like the
    * Spark side's pre-bm25 filter. */
  /** q379's trees: Poisson-expected document frequency
    * E[df] = D·(1 − e^(−cf/D)) and the expected/observed burstiness
    * ratio — shared text, one IEEE tree each (df ≥ 1 for any term
    * that exists, so the ratio is division-safe). Objects are lazily
    * initialized, so THIS may sit below the oracle map; the plain
    * BurstK val may not (q362 lesson) and lives with the constants. */
  private[operators] object BurstFormula {
    private val edf = "(CAST(d AS DOUBLE) * (1.0 - exp(" +
      "-CAST(cf AS DOUBLE) / CAST(d AS DOUBLE))))"
    val edf4: String = s"round($edf, 4)"
    val burst4: String = s"round($edf / CAST(df AS DOUBLE), 4)"
  }

  /** q362's oracle: the q94 tf/doc-length CTEs with COLLECTION
    * frequencies instead of document frequencies, the same matched-form
    * per-term trees 6dp-quantized + decimal-summed, ranked on the
    * exact decimal — ends in `qr(id, score4, rank)`. */
  private def qlmRankCteSql(terms: Seq[String] = Bm25Terms,
    mu: Double = QlmMu): String = {
    def tf(i: Int) =
      s"CAST(len(tk) - len(list_filter(tk, x -> x != '${terms(i)}')) AS BIGINT)"
    def si(i: Int) =
      s"ROUND(CASE WHEN cf_$i > 0 THEN LN(1.0 + CAST(tf_$i AS DOUBLE) " +
        s"* CAST(c_len AS DOUBLE) / ($mu * CAST(cf_$i AS DOUBLE))) " +
        s"ELSE 0.0 END, 6)"
    val lenT = s"ROUND(${terms.size}.0 * LN($mu " +
      s"/ (CAST(dl AS DOUBLE) + $mu)), 6)"
    val ix = terms.indices
    s"""d AS (
       |  SELECT doc_id AS id, $sqlToks AS tk FROM documents
       |), t AS (
       |  SELECT id, CAST(len(tk) AS BIGINT) AS dl,
       |         ${ix.map(i => s"${tf(i)} AS tf_$i").mkString(", ")}
       |  FROM d
       |), st AS (
       |  SELECT CAST(SUM(dl) AS BIGINT) AS c_len,
       |         ${ix.map(i => s"CAST(SUM(tf_$i) AS BIGINT) AS cf_$i")
            .mkString(", ")}
       |  FROM t
       |), sc AS (
       |  SELECT id,
       |         ${(ix.map(i => s"CAST(${si(i)} AS DECIMAL(38,6))") :+
            s"CAST($lenT AS DECIMAL(38,6))").mkString(" + ")} AS score_dec
       |  FROM t CROSS JOIN st
       |  WHERE ${ix.map(i => s"tf_$i > 0").mkString(" OR ")}
       |), qr AS (
       |  SELECT id, ROUND(CAST(score_dec AS DOUBLE), 4) AS score4,
       |         CAST(ROW_NUMBER() OVER (ORDER BY score_dec DESC NULLS LAST,
       |                                 id ASC NULLS FIRST) AS INT) AS rank
       |  FROM sc
       |)""".stripMargin
  }

  private[operators] def bm25RankCteSql(
    terms: Seq[String] = Bm25Terms, k1: Double = K1, b: Double = B,
    excludeId: Option[Long] = None)
  : String = {
    val tfBoost = k1 + 1
    val bComp = 1 - b
    def tf(i: Int) =
      s"CAST(len(tk) - len(list_filter(tk, x -> x != '${terms(i)}')) AS BIGINT)"
    def si(i: Int) =
      s"ROUND(LN(1.0 + (CAST(n_docs - df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5))" +
        s" * (CAST(tf_$i AS DOUBLE) * $tfBoost)" +
        s" / (CAST(tf_$i AS DOUBLE) + $k1 * ($bComp + $b * CAST(dl AS DOUBLE) / avgdl)), 6)"
    val ix = terms.indices
    val where = excludeId.map(x => s" WHERE doc_id != $x").getOrElse("")
    s"""d AS (
       |  SELECT doc_id AS id, $sqlToks AS tk FROM documents$where
       |), t AS (
       |  SELECT id, CAST(len(tk) AS BIGINT) AS dl,
       |         ${ix.map(i => s"${tf(i)} AS tf_$i").mkString(", ")}
       |  FROM d
       |), st AS (
       |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
       |         ${ix.map(i =>
              s"CAST(SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i")
              .mkString(", ")}
       |  FROM t
       |), sc AS (
       |  SELECT id,
       |         ${ix.map(i => s"CAST(${si(i)} AS DECIMAL(38,6))")
              .mkString(" + ")} AS score_dec
       |  FROM t CROSS JOIN
       |    (SELECT *, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl FROM st) s
       |  WHERE ${ix.map(i => s"tf_$i > 0").mkString(" OR ")}
       |), bmr AS (
       |  SELECT id, ROUND(CAST(score_dec AS DOUBLE), 4) AS score4,
       |         CAST(ROW_NUMBER() OVER (ORDER BY score_dec DESC NULLS LAST,
       |                                 id ASC NULLS FIRST) AS INT) AS rank
       |  FROM sc
       |)""".stripMargin
  }
}
