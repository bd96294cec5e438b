package graft.operators

import graft.{Dets, Tables}
import graft.functions.TextFunctions
import graft.functions.TextFunctions.Sql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.10 text operators: exact/near dedup (q60/q61), explode/top-k (q64),
  * corpus stats (q65) — plus the training-data-pipeline extensions:
  * n-gram-profile language ID (q71), quality scoring (q72), token
  * counting (q73), rolling-hash fingerprinting (q74).
  *
  * Scale notes: all per-document scoring is pure projection (codegen, no
  * shuffle). q61's exact-Jaccard self-join is blocked on `lang`; it exists
  * as the deterministic oracle target — the scale path for 100 TB dedup is
  * the MinHash/LSH pipeline in SketchQueries (q66), which replaces the
  * O(n²/blocks) comparison with banded bucket joins.
  */
object TextQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.loadSpread(s, dir, n)

  private def withToks(df: DataFrame): DataFrame =
    df.withColumn("toks", TextFunctions.tokenSet(col("text")))

  /** Per-doc sorted token-hash table (id, block, hs) from
    * [[graft.api.TextOps.tokenHashTable]] bound to the documents schema,
    * memoized per (session, dir): every pair pipeline reads it from both
    * self-join sides and three pipelines (q61, q77, q82) start from it,
    * so tokenization + hashing materialize once per session. */
  def hashedDocs(s: SparkSession, dir: String): DataFrame =
    graft.Caches.memo(s, s"text.hashed:$dir") {
      graft.api.TextOps.tokenHashTable(
        t(s, dir, "documents"), "doc_id", "text", "lang")
    }

  /** Memoized n-gram-profile language predictions (id, pred_lang,
    * score) — q71 emits them joined to the truth labels and q120
    * aggregates them into the confusion matrix, so the profile build +
    * scoring join materialize once per session. */
  private[graft] def langPred(s: SparkSession, dir: String): DataFrame =
    graft.Caches.memo(s, s"text.langpred:$dir") {
      graft.api.TextOps.languageId(
        t(s, dir, "documents"), "doc_id", "text", "lang")
    }

  /** Exact near-dup pairs (id_lo < id_hi, same lang, token-set Jaccard ≥
    * `minJac`) with the unrounded `jac` — the q61 result and the edge set
    * q77's cluster resolution propagates over. The verified pair table
    * is shared too: within a session the O(pairs) intersect scan runs
    * once, not once per consumer. */
  def nearDupPairs(s: SparkSession, dir: String, minJac: Double): DataFrame =
    graft.Caches.memo(s, s"text.pairs:$dir:$minJac") {
      graft.api.TextOps.nearDupPairs(hashedDocs(s, dir), minJac)
    }

  /** Release this session's cached hash/pair tables, every other
    * operator family's memoized frames, and every builder-internal
    * persist — all live in the one [[graft.Caches]] registry.
    * Long-lived hosts that cycle sessions must call this when done
    * with a session; Verify/Bench do. */
  def clearCaches(s: SparkSession): Unit = graft.Caches.clear(s)

  /** CTE chain ending in `pred(doc_id, pred_lang, score)` — the q71
    * language-ID replay (top-20 per-language token profiles, per-doc
    * shared-token argmax), shared by the q71 and q120 oracles so both
    * gate one classifier definition. */
  private def langIdCteSql: String =
    s"""doctok AS (
       |  SELECT doc_id, lang, unnest(${Sql.tokenSet("text")}) AS tok FROM documents
       |), prof AS (
       |  SELECT plang, tok FROM (
       |    SELECT lang AS plang, tok, COUNT(*) AS cnt
       |    FROM doctok GROUP BY lang, tok) g
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY plang
       |    ORDER BY cnt DESC NULLS LAST, tok ASC NULLS FIRST) <= 20
       |), score AS (
       |  SELECT d.doc_id, p.plang, COUNT(*) AS score
       |  FROM doctok d JOIN prof p ON d.tok = p.tok
       |  GROUP BY d.doc_id, p.plang
       |), pred AS (
       |  SELECT doc_id, plang AS pred_lang, score FROM score
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC NULLS LAST, plang ASC NULLS FIRST) = 1
       |)""".stripMargin

  /** Oracle-side CTE text for the same edge set (jac ≥ 0.6), shared by the
    * q61 and q77 oracles so both replay one definition. */
  val nearDupEdgeSql: String =
    s"""d AS (SELECT doc_id, lang, ${Sql.tokenSet("text")} AS toks FROM documents),
       |e AS (
       |  SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
       |         CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
       |         / len(list_distinct(a.toks || b.toks)) AS jac
       |  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
       |        / len(list_distinct(a.toks || b.toks)) >= 0.6
       |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_dedup_exact" -> ((s, dir) =>
      graft.api.DedupOps.exactGroups(t(s, dir, "documents"), "doc_id", "text")
        .select("keep_id", "n_copies", "text")
        .orderBy("keep_id")),

    // Token sets are compared as SORTED HASH arrays via the codegen merge
    // -intersect expression (graft_sorted_intersect): |A∪B| = |A|+|B|-|A∩B|.
    // Hash collisions would skew counts; OperatorSpec asserts the corpus
    // vocabulary is collision-free under the rolling hash.
    "q61_dedup_near" -> ((s, dir) =>
      nearDupPairs(s, dir, 0.6)
        .select(col("id_lo"), col("id_hi"), round(col("jac"), 4).as("jac4"))
        .orderBy("id_lo", "id_hi")),

    // Dedup-threshold frontier — the tuning table behind the q61/q77
    // cutoff choice: at Jaccard ≥ 0.7 / 0.8 / 0.9, how many pairs
    // survive and how many documents become droppable (the id_hi
    // side of at least one pair — the star-dedup upper bound on
    // removals; the exact cluster count at the chosen cutoff is
    // q77's job). One conditional-sum pass over the memoized pair
    // relation — the sweep costs nothing beyond the pairs q61
    // already built; comparisons are on the 4dp-rounded similarity
    // both engines compute identically.
    "q350_dedup_frontier" -> ((s, dir) => {
      val e = nearDupPairs(s, dir, 0.6)
        .select(col("id_hi"), round(col("jac"), 4).as("j4"))
      val aggs = FrontierTs.flatMap { case (n, thr) => Seq(
        sum(when(col("j4") >= thr, 1L).otherwise(0L)).as(s"p$n"),
        count_distinct(when(col("j4") >= thr, col("id_hi")))
          .as(s"d$n")) }
      e.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${FrontierTs.size}, " +
          FrontierTs.map { case (n, _) => s"$n, p$n, d$n" }
            .mkString(", ") +
          ") as (threshold_pm, n_pairs, n_droppable)")
        .orderBy("threshold_pm")
    }),

    // Containment catches what Jaccard misses: a short doc quoted whole
    // inside a long one has high |A∩B|/|A| but low Jaccard. No size-ratio
    // prune applies (the smaller side can always be fully contained), so
    // this is the full blocked pair scan with the codegen intersect.
    "q82_containment" -> ((s, dir) =>
      graft.api.TextOps.containmentPairs(hashedDocs(s, dir), 0.9)
        .select(col("id_lo"), col("id_hi"),
          round(col("c_lo"), 4).as("c_lo4"), round(col("c_hi"), 4).as("c_hi4"))
        .orderBy("id_lo", "id_hi")),

    // q82's 100 TB form, gated against the SAME oracle: prefix-filtered
    // candidate generation (rarest ⌊0.1·|X|⌋+1 tokens joined against the
    // inverted index — exact recall by the prefix-filter bound, never a
    // blocked quadratic scan), identical verify, identical result set.
    "q111_containment_prefix" -> ((s, dir) =>
      graft.api.TextOps.containmentPairsPrefix(hashedDocs(s, dir), 0.9)
        .select(col("id_lo"), col("id_hi"),
          round(col("c_lo"), 4).as("c_lo4"), round(col("c_hi"), 4).as("c_hi4"))
        .orderBy("id_lo", "id_hi")),

    "q64_text_explode" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(20)),

    "q65_text_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_toks", size(TextFunctions.tokens(col("text"))))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          decAvg(col("n_chars")).as("avg_chars"),
          decAvg(col("n_toks")).as("avg_toks"))
        .orderBy("lang")),

    "q71_lang_id" -> ((s, dir) =>
      t(s, dir, "documents").select("doc_id", "lang")
        .join(langPred(s, dir), col("doc_id") === col("id"))
        .select("doc_id", "lang", "pred_lang", "score")
        .orderBy("doc_id")),

    // Language-ID confusion matrix — the QA view over q71's classifier:
    // per (true lang, predicted lang), how many docs landed there. The
    // prediction table is the memoized q71 result, so the profile build
    // and scoring join run once per session for both consumers; the
    // matrix itself is one hash agg over |langs|² groups.
    "q120_lang_confusion" -> ((s, dir) =>
      t(s, dir, "documents").select("doc_id", "lang")
        .join(langPred(s, dir), col("doc_id") === col("id"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred_lang")),

    // Matthews correlation of the q71 language-ID gate, one-vs-rest
    // per lang (Matthews 1975, public textbook) — the IMBALANCE-ROBUST
    // scalar next to q120's raw confusion matrix: accuracy flatters a
    // classifier that just predicts the majority lang, MCC does not.
    // Third consumer of the shared langPred memo; the bounded ×|langs|
    // one-vs-rest fan-out rides a broadcast dimension cross (the q373
    // ring convention), confusion cells are one conditional agg, and
    // the coefficient is a shared-string IEEE tree over the four
    // counts (MccFormula [D3]), NULL on a degenerate margin.
    "q386_mcc_langid" -> ((s, dir) => {
      val j = t(s, dir, "documents").select(col("doc_id"), col("lang"))
        .join(langPred(s, dir), col("doc_id") === col("id"))
        .select(col("lang"), col("pred_lang"))
      val dim = j.select(col("lang").as("cls")).distinct()
      j.crossJoin(broadcast(dim))
        .groupBy("cls")
        .agg(
          sum(when(col("lang") === col("cls")
            && col("pred_lang") === col("cls"), 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("lang") =!= col("cls")
            && col("pred_lang") === col("cls"), 1L).otherwise(0L))
            .as("fp"),
          sum(when(col("lang") === col("cls")
            && col("pred_lang") =!= col("cls"), 1L).otherwise(0L))
            .as("fn"),
          sum(when(col("lang") =!= col("cls")
            && col("pred_lang") =!= col("cls"), 1L).otherwise(0L))
            .as("tn"))
        .select(col("cls"), col("tp"), col("fp"), col("fn"), col("tn"),
          expr(MccFormula.mcc4).as("mcc4"))
        .orderBy("cls")
    }),

    // Winnowing fingerprint audit (Schleimer, Wilkerson & Aiken 2003 —
    // the public MOSS local-fingerprinting algorithm) — the
    // guaranteed-coverage upgrade of q74's single rolling hash: every
    // window of WinW consecutive token-3-gram hashes contributes its
    // MINIMUM, so any shared run of ≥ WinW+2 tokens between two docs
    // shares a fingerprint BY CONSTRUCTION (q74's whole-doc hash only
    // catches exact duplicates). Per-doc selection is pure array math
    // on the codegen gram kernel (no explode until the bounded
    // fingerprint sets), rolled up per lang with the integer-staged
    // density and the count of fingerprints seen in ≥ 2 docs — the
    // cheap plagiarism/boilerplate signal. Scale: one narrow map per
    // doc + one fingerprint-keyed agg, the q66-class shape.
    "q387_winnowing" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          call_function("graft_ngram_hashes",
            call_function("graft_token_hashes",
              TextFunctions.tokens(col("text"))), lit(WinK)).as("grams"))
        .withColumn("nw",
          greatest(lit(0), size(col("grams")) - (WinW - 1)))
        .withColumn("fps", when(col("nw") <= 0,
            expr("CAST(array() AS array<bigint>)"))
          .otherwise(array_distinct(transform(
            sequence(lit(1), col("nw")),
            i => array_min(slice(col("grams"), i, lit(WinW)))))))
      val per = d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).cast("long").as("n_windows"),
          sum(size(col("fps"))).cast("long").as("n_fps"))
      val fd = d.select(col("lang"), col("doc_id"),
        explode(col("fps")).as("fp"))
      val gc = fd.groupBy("fp").agg(count(lit(1)).as("nd"))
      val sh = fd.join(gc, Seq("fp")).filter(col("nd") >= 2)
        .groupBy("lang")
        .agg(countDistinct(col("fp")).as("n_shared_fp"))
      per.join(sh, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("n_windows"),
          col("n_fps"),
          when(col("n_windows") > 0,
            round(expr("(n_fps * 10000) div n_windows").cast("double")
              / 1e4, 4)).as("density4"),
          coalesce(col("n_shared_fp"), lit(0L)).as("n_shared_fp"))
        .orderBy("lang")
    }),

    // TRAINED language classifier — multinomial Naive Bayes with
    // Laplace smoothing, the learned upgrade of q71's shared-token
    // heuristic and the lang-ID sibling of the q235 quality
    // perceptron: token-count likelihoods fit on the q78-convention
    // train buckets (charHash(text) % 10 < 8), scored on the held-out
    // 20% — so the confusion matrix this emits is a real
    // generalization measure, not training-set recall. The smoothing
    // identity makes unseen tokens free: score(d, L) = ln P(L) +
    // Σ_seen ln(cnt+1) − n_tok·ln(tot_L + V), so the scoring join
    // touches only (token, lang) pairs the TRAIN corpus contains —
    // at 100 TB that's one explode + one vocabulary-sized map-side
    // join + one (doc, lang) agg; the |langs|-row model table
    // broadcasts. Every ln is 6dp-quantized to decimal ([D2], the
    // q98 idiom) and all staging stays inside decimal widths both
    // engines compute exactly, so the argmax — and the matrix — is
    // engine- and partition-invariant.
    "q250_nb_langid" -> ((s, dir) => {
      // persistTracked: five subtrees read this projection (train
      // counts, priors, train size, test explode, test scoring) — each
      // re-ran the parquet scan + tokenize before r14; one tokenize
      // pass now feeds all of them
      val d = graft.Caches.persistTracked(t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextFunctions.tokens(col("text")).as("toks"),
          expr(s"(${TextFunctions.charHash("text")}) % 10").as("bucket"))
        .withColumn("n_tok", size(col("toks")).cast("long"))
        .filter(col("n_tok") >= 1))
      val train = d.filter(col("bucket") < 8)
      val test = d.filter(col("bucket") >= 8)
      val cnt = graft.Caches.persistTracked(
        train.select(col("lang").as("plang"),
            explode(col("toks")).as("tok"))
          .groupBy("plang", "tok").agg(count(lit(1)).as("cnt")))
      val tot = cnt.groupBy("plang").agg(sum(col("cnt")).as("tot"))
      val vv = cnt.agg(countDistinct(col("tok")).as("v"))
      val pri = train.groupBy(col("lang").as("plang"))
        .agg(count(lit(1)).as("nd"))
      val ntr = train.agg(count(lit(1)).as("ntrain"))
      val ls = pri.join(tot, "plang")
        .crossJoin(broadcast(vv)).crossJoin(broadcast(ntr))
        .select(col("plang"),
          round(log(col("nd").cast("double") / col("ntrain")), 6)
            .cast("decimal(12,6)").as("prior"),
          round(log((col("tot") + col("v")).cast("double")), 6)
            .cast("decimal(12,6)").as("pen"))
      val seen = test.select(col("doc_id"), explode(col("toks")).as("tok"))
        .join(cnt, "tok")
        .groupBy("doc_id", "plang")
        .agg(sum(round(log((col("cnt") + 1).cast("double")), 6)
          .cast(Dec)).cast("decimal(26,6)").as("ssum"))
      val sc = test.select(col("doc_id"), col("lang"), col("n_tok"))
        .crossJoin(broadcast(ls))
        .join(seen, Seq("doc_id", "plang"), "left")
        .withColumn("score",
          coalesce(col("ssum"), lit(0).cast("decimal(26,6)"))
            - col("n_tok").cast("decimal(12,0)") * col("pen")
            + col("prior"))
      sc.withColumn("rn", row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("plang").asc)))
        .filter(col("rn") === 1)
        .groupBy(col("lang"), col("plang").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred_lang")
    }),

    // K-fold cross-validation of the q250 Naive Bayes language
    // classifier — the EVAL the single 80/20 split cannot give (5
    // accuracy measurements instead of 1, every doc scored exactly
    // once as held-out). The trick that keeps it ONE-PASS: fold f's
    // train counts are the COMPLEMENT cg − cf of two shared
    // aggregations (global and per-fold token counts), so training
    // never rescans the corpus per fold — the per-fold model tables
    // are K× the vocabulary, built from one explode. Scoring rides
    // the fold key through the token join (each held-out doc meets
    // exactly its own fold's complement counts). Same decimal-staged
    // ln quantization as q250 ([D2]) — fold accuracies are engine-
    // and partition-invariant. Content-hash folds (q78 convention:
    // charHash % 10 div 2 — deterministic, reproducible splits).
    "q270_nb_crossval" -> ((s, dir) => {
      val kf = 5
      // persistTracked: six subtrees read this projection (the token
      // explode plus the four fold/prior counts and the scoring side) —
      // each re-ran the parquet scan + tokenize before r14
      val d = graft.Caches.persistTracked(t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextFunctions.tokens(col("text")).as("toks"),
          expr(s"((${TextFunctions.charHash("text")}) % 10) div 2")
            .as("fold"))
        .withColumn("n_tok", size(col("toks")).cast("long"))
        .filter(col("n_tok") >= 1))
      val occ = graft.Caches.persistTracked(
        d.select(col("doc_id"), col("lang"), col("fold"),
          explode(col("toks")).as("tok")))
      val cf = graft.Caches.persistTracked(
        occ.groupBy(col("lang").as("plang"), col("tok"), col("fold"))
          .agg(count(lit(1)).as("c")))
      val cg = cf.groupBy("plang", "tok").agg(sum("c").as("cg"))
      val folds = s.range(0, kf).select(col("id").as("fold"))
      val tc = graft.Caches.persistTracked(
        cg.crossJoin(broadcast(folds))
          .join(cf, Seq("plang", "tok", "fold"), "left")
          .select(col("fold"), col("plang"), col("tok"),
            (col("cg") - coalesce(col("c"), lit(0L))).as("tc"))
          .filter(col("tc") > 0))
      val tot = tc.groupBy("fold", "plang").agg(sum("tc").as("tot"))
      val v = tc.groupBy("fold").agg(countDistinct("tok").as("v"))
      val ndf = d.groupBy(col("fold"), col("lang").as("plang"))
        .agg(count(lit(1)).as("ndf"))
      val ndg = d.groupBy(col("lang").as("plang"))
        .agg(count(lit(1)).as("ndg"))
      val nf = d.groupBy("fold").agg(count(lit(1)).as("nf"))
      val ng = d.agg(count(lit(1)).as("ng"))
      val pri = ndg.crossJoin(broadcast(folds))
        .join(ndf, Seq("plang", "fold"), "left")
        .select(col("fold"), col("plang"),
          (col("ndg") - coalesce(col("ndf"), lit(0L))).as("nd"))
        .filter(col("nd") > 0)
      val ntr = nf.crossJoin(broadcast(ng))
        .select(col("fold"), (col("ng") - col("nf")).as("ntrain"))
      val ls = pri.join(tot, Seq("fold", "plang"))
        .join(broadcast(v), "fold").join(broadcast(ntr), "fold")
        .select(col("fold"), col("plang"),
          round(log(col("nd").cast("double") / col("ntrain")), 6)
            .cast("decimal(12,6)").as("prior"),
          round(log((col("tot") + col("v")).cast("double")), 6)
            .cast("decimal(12,6)").as("pen"))
      val seen = occ.join(tc, Seq("tok", "fold"))
        .groupBy("doc_id", "plang")
        .agg(sum(round(log((col("tc") + 1).cast("double")), 6)
          .cast(Dec)).cast("decimal(26,6)").as("ssum"))
      val sc = d.select(col("doc_id"), col("lang"), col("n_tok"),
          col("fold"))
        .join(broadcast(ls), Seq("fold"))
        .join(seen, Seq("doc_id", "plang"), "left")
        .withColumn("score",
          coalesce(col("ssum"), lit(0).cast("decimal(26,6)"))
            - col("n_tok").cast("decimal(12,0)") * col("pen")
            + col("prior"))
      sc.withColumn("rn", row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("plang").asc)))
        .filter(col("rn") === 1)
        .groupBy("fold")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("plang") === col("lang"), 1L).otherwise(0L))
            .as("n_correct"))
        .withColumn("acc4",
          round(col("n_correct").cast("double") / col("n_test"), 4))
        .orderBy("fold")
    }),

    "q72_quality_score" -> ((s, dir) =>
      graft.api.TextOps.qualityScore(t(s, dir, "documents"), "text")
        .select("doc_id", "n_tok", "n_uniq", "ttr", "avg_tok_len", "quality")
        .orderBy("doc_id")),

    "q73_token_count" -> ((s, dir) =>
      graft.api.TextOps.tokenCounts(t(s, dir, "documents"), "text",
        charCountCol = Some("n_chars"))
        .select("doc_id", "n_ws", "n_alpha", "bpe_est")
        .orderBy("doc_id")),

    "q74_fingerprint" -> ((s, dir) =>
      graft.api.TextOps.fingerprint(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("fp"),
          (col("fp") * 2654435761L).as("fp_spread"))
        .orderBy("doc_id")),

    // Unigram-LM mean surprisal per doc — the perplexity-style quality
    // filter (CCNet/Gopher shape) with the corpus itself as the LM:
    // surprisal(t) = ln(N / tf(t)), doc score = mean over token
    // OCCURRENCES. Each occurrence's term is quantized to 6dp and
    // decimal-summed (order-independent, q48's pattern), so the score is
    // partition-invariant. Two hash aggs (corpus tf, per-doc sum) and
    // one join of the exploded tokens against the vocabulary-sized tf
    // table — AQE broadcasts tf while it fits; at 100 TB the vocabulary
    // is still ~millions of rows, far under the token count, and the
    // join stays map-side.
    "q98_surprisal" -> ((s, dir) => {
      // dt feeds the tf aggregation AND the occurrence join — persist
      // so the corpus tokenize+explode runs once (tfidfTopTerms pattern)
      val dt = graft.Caches.persistTracked(t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("tok")))
      val tf = dt.groupBy("tok").agg(count(lit(1)).as("tf"))
      val n = tf.agg(sum("tf").as("n_total"))
      dt.join(tf, "tok").crossJoin(broadcast(n))
        .withColumn("term",
          round(log(col("n_total").cast("double") / col("tf")), 6).cast(Dec))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          round(sum(col("term")).cast("double") / count(lit(1)), 4)
            .as("surprisal4"))
        .orderBy("doc_id")
    }),

    // Regex feature extraction per language: non-overlapping
    // vowel-bigram match counts (regexp_count — Java and RE2 agree on
    // leftmost non-overlapping semantics for this alternation-free
    // pattern) and leading-capital doc counts. One pushed-down scan of
    // (text, lang), one map-side-combinable agg — regexes stay inside
    // whole-stage codegen, no UDF.
    "q184_regexp_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(regexp_count(col("text"), lit("[aeiou]{2}"))).as("n_vruns"),
          sum(when(col("text").rlike("^[A-Z]"), 1L).otherwise(0L))
            .as("n_capital"))
        .orderBy("lang"))
,
    // PII redaction — the scrub stage every training-data pipeline runs
    // before release: synthetic contact lines (built deterministically
    // from customer rows, so the fixture needs no real PII) have their
    // email addresses and long digit runs replaced by placeholder
    // tokens. The gate hashes the EXACT redacted text (length +
    // polynomial charhash sums), so a single mis-redacted byte breaks
    // it; counts of redactions per segment pin the match semantics.
    // Regexes stick to portable character-class constructs (both
    // engines' regex dialects agree on them).
    "q222_pii_redact" -> ((s, dir) => {
      val raw = concat(col("c_name"), lit(" <"),
        lower(regexp_replace(col("c_name"), " ", ".")),
        lit("@example.com> phone 555-"),
        (col("c_custkey") % 10000).cast("string"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), raw.as("txt"))
        .withColumn("red1",
          regexp_replace(col("txt"), "[a-z0-9.#]+@[a-z.]+", "<EMAIL>"))
        .withColumn("red",
          regexp_replace(col("red1"), "[0-9]{3,}", "<NUM>"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          sum(regexp_count(col("txt"), lit("[a-z0-9.#]+@[a-z.]+")))
            .as("n_emails"),
          sum(length(col("red"))).cast("long").as("sum_len"),
          sum(expr("graft_charhash(red)")).as("hsum"))
        .orderBy("c_mktsegment")
    }),

    // Readability census per source — Flesch reading ease and
    // Flesch–Kincaid grade (public-textbook formulas) from exact
    // integer counts: words (house whitespace tokens), syllables (the
    // classic vowel-group heuristic: runs of [aeiouy], floored at one
    // per word — the q72 quality family's missing LENGTH-COMPLEXITY
    // axis). The synthetic corpus carries no sentence punctuation, so
    // the pinned sentence convention is one sentence per document
    // (documented here and in SURVEY §2; swap a [.!?]+ run count in
    // when a punctuated corpus lands). One explode + two hash aggs
    // joined on the 4-row source dimension; the formulas are
    // shared-string IEEE trees (ReadFormula) over exact counts [D3].
    "q330_readability" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(col("source"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      val words = toks.groupBy("source").agg(
        count(lit(1)).as("n_words"),
        sum(greatest(lit(1), size(regexp_extract_all(col("w"),
          lit("[aeiouy]+"), lit(0))))).as("n_syll"))
      val docs = t(s, dir, "documents").groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
      docs.join(words, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_syll"),
          expr(ReadFormula.fre4).as("fre4"),
          expr(ReadFormula.fkg4).as("fkg4"))
        .orderBy("source")
    })
  )

  /** q330's Flesch / Flesch–Kincaid trees over the exact counts
    * (n_docs = sentences by the pinned convention, n_words, n_syll)
    * — shared text, one IEEE tree each. */
  /** q386's Matthews correlation tree over the four confusion counts
    * (tp, fp, fn, tn) — the denominator factors under separate sqrts
    * so the products can never overflow a double's exact-integer
    * range, and a zero margin yields NULL, not a division error. */
  private[operators] object MccFormula {
    private val num = "(CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) " +
      "- CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))"
    private val den = "(sqrt(CAST(tp + fp AS DOUBLE)) " +
      "* sqrt(CAST(tp + fn AS DOUBLE)) " +
      "* sqrt(CAST(tn + fp AS DOUBLE)) " +
      "* sqrt(CAST(tn + fn AS DOUBLE)))"
    val mcc4: String = s"round(CASE WHEN $den > 0 THEN $num / $den END, 4)"
  }

  private[operators] object ReadFormula {
    private val wps = "(CAST(n_words AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    private val spw = "(CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))"
    val fre4: String =
      s"round(206.835 - 1.015 * $wps - 84.6 * $spw, 4)"
    val fkg4: String =
      s"round(0.39 * $wps + 11.8 * $spw - 15.59, 4)"
  }

  /** q350's similarity cutoffs: (permille label, threshold). */
  private val FrontierTs = Seq(("700", 0.7), ("800", 0.8), ("900", 0.9))

  /** q387's winnowing geometry: token-3-gram hashes, window of 4 —
    * guarantee threshold t = WinW + WinK − 1 = 6 tokens (any shared
    * run of ≥ t tokens shares a fingerprint). Declared before the
    * oracle map interpolates. */
  private val WinK = 3
  private val WinW = 4

  private val sqlToks = Sql.tokens("text")
  private val sqlTokSet = Sql.tokenSet("text")

  /** One containment specification for two implementations: q82 (exact
    * blocked scan) and q111 (prefix-filtered candidates) both gate
    * against this quadratic replay. */
  private def containmentOracleSql: String =
    s"""WITH d AS (SELECT doc_id, lang, $sqlTokSet AS toks FROM documents)
       |SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
       |       ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
       |             / len(a.toks), 4) AS c_lo4,
       |       ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
       |             / len(b.toks), 4) AS c_hi4
       |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |WHERE greatest(
       |        CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(a.toks),
       |        CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(b.toks))
       |      >= 0.9
       |ORDER BY id_lo ASC NULLS FIRST, id_hi ASC NULLS FIRST""".stripMargin

  val oracle: Map[String, String] = Map(
    "q60_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, text
        |FROM documents GROUP BY text ORDER BY keep_id ASC NULLS FIRST""".stripMargin,

    // the syllable replay: same tokens, same vowel-run heuristic, the
    // SAME ReadFormula strings
    "q330_readability" ->
      s"""WITH toks AS (
         |  SELECT source, unnest($sqlToks) AS w FROM documents),
         |words AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
         |         CAST(SUM(GREATEST(1,
         |           len(regexp_extract_all(w, '[aeiouy]+'))))
         |           AS BIGINT) AS n_syll
         |  FROM toks GROUP BY 1),
         |docs AS (
         |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_words,
         |       n_syll,
         |       ${ReadFormula.fre4} AS fre4,
         |       ${ReadFormula.fkg4} AS fkg4
         |FROM docs JOIN words USING (source)
         |ORDER BY source ASC NULLS FIRST""".stripMargin,

    "q61_dedup_near" ->
      s"""WITH $nearDupEdgeSql
         |SELECT id_lo, id_hi, ROUND(jac, 4) AS jac4 FROM e
         |ORDER BY id_lo ASC NULLS FIRST, id_hi ASC NULLS FIRST""".stripMargin,

    // the frontier replay: the shared pair CTE + the same rounded-
    // similarity conditional sums, UNION-ALL unpivot
    "q350_dedup_frontier" -> {
      val aggs = FrontierTs.map { case (n, thr) =>
        s"SUM(CASE WHEN j4 >= $thr THEN 1 ELSE 0 END) AS p$n,\n" +
          s"         |         COUNT(DISTINCT CASE WHEN j4 >= $thr " +
          s"THEN id_hi END) AS d$n" }.mkString(",\n         |         ")
      val rows = FrontierTs.map { case (n, _) =>
        s"SELECT CAST($n AS INT) AS threshold_pm, p$n AS n_pairs, " +
          s"d$n AS n_droppable FROM a" }
        .mkString("\n         |  UNION ALL ")
      s"""WITH $nearDupEdgeSql,
         |j AS (SELECT id_hi, ROUND(jac, 4) AS j4 FROM e),
         |a AS (
         |  SELECT $aggs
         |  FROM j),
         |curve AS (
         |  $rows)
         |SELECT threshold_pm, CAST(n_pairs AS BIGINT) AS n_pairs,
         |       CAST(n_droppable AS BIGINT) AS n_droppable
         |FROM curve
         |ORDER BY threshold_pm ASC NULLS FIRST""".stripMargin
    },

    "q82_containment" -> containmentOracleSql,

    // Same specification: q111 is result-identical to q82 by the
    // prefix-filter recall guarantee, so the algorithm-independent
    // quadratic replay gates both.
    "q111_containment_prefix" -> containmentOracleSql,

    "q64_text_explode" ->
      s"""SELECT word, COUNT(*) AS cnt
         |FROM (SELECT unnest($sqlToks) AS word FROM documents) w
         |GROUP BY word
         |ORDER BY cnt DESC NULLS LAST, word ASC NULLS FIRST LIMIT 20""".stripMargin,

    "q65_text_stats" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
         |  ROUND(CAST(SUM(CAST(len($sqlToks) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 4) AS avg_toks
         |FROM documents GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin,

    "q71_lang_id" ->
      s"""WITH $langIdCteSql
         |SELECT d.doc_id, d.lang, p.pred_lang, p.score
         |FROM pred p JOIN documents d ON p.doc_id = d.doc_id
         |ORDER BY d.doc_id ASC NULLS FIRST""".stripMargin,

    "q120_lang_confusion" ->
      s"""WITH $langIdCteSql
         |SELECT d.lang, p.pred_lang, COUNT(*) AS n_docs
         |FROM pred p JOIN documents d ON p.doc_id = d.doc_id
         |GROUP BY d.lang, p.pred_lang
         |ORDER BY lang ASC NULLS FIRST, pred_lang ASC NULLS FIRST"""
        .stripMargin,

    // the same gram kernel replay (Sql.ngramHashes over token hashes),
    // the same window-min selection, integer-staged density
    "q387_winnowing" -> {
      val grams = Sql.ngramHashes(Sql.tokenHashes(sqlToks), WinK)
      s"""WITH d AS (
         |  SELECT doc_id, lang, $grams AS grams FROM documents),
         |w AS (
         |  SELECT doc_id, lang,
         |         greatest(len(grams) - ${WinW - 1}, 0) AS nw,
         |         CASE WHEN len(grams) >= $WinW THEN
         |           list_distinct(list_transform(
         |             range(1, len(grams) - ${WinW - 1} + 1),
         |             i -> list_aggregate(grams[i : i + ${WinW - 1}],
         |                                 'min')))
         |         ELSE CAST([] AS BIGINT[]) END AS fps
         |  FROM d),
         |per AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |         CAST(SUM(nw) AS BIGINT) AS n_windows,
         |         CAST(SUM(len(fps)) AS BIGINT) AS n_fps
         |  FROM w GROUP BY 1),
         |fd AS (SELECT lang, doc_id, unnest(fps) AS fp FROM w),
         |gc AS (SELECT fp, COUNT(*) AS nd FROM fd GROUP BY 1),
         |sh AS (
         |  SELECT lang, CAST(COUNT(DISTINCT fd.fp) AS BIGINT)
         |           AS n_shared_fp
         |  FROM fd JOIN gc ON fd.fp = gc.fp
         |  WHERE gc.nd >= 2 GROUP BY 1)
         |SELECT per.lang, n_docs, n_windows, n_fps,
         |       CASE WHEN n_windows > 0 THEN
         |         ROUND(CAST((n_fps * 10000) // n_windows AS DOUBLE)
         |               / 1e4, 4) END AS density4,
         |       COALESCE(n_shared_fp, 0) AS n_shared_fp
         |FROM per LEFT JOIN sh ON per.lang = sh.lang
         |ORDER BY per.lang ASC NULLS FIRST""".stripMargin
    },

    // the same classifier CTE (third oracle consumer), the same
    // one-vs-rest conditional cells, the SAME MccFormula tree
    "q386_mcc_langid" ->
      s"""WITH $langIdCteSql,
         |j AS (
         |  SELECT d.lang, p.pred_lang
         |  FROM pred p JOIN documents d ON p.doc_id = d.doc_id),
         |dim AS (SELECT DISTINCT lang AS cls FROM j),
         |m AS (
         |  SELECT cls,
         |         CAST(SUM(CASE WHEN lang = cls AND pred_lang = cls
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |         CAST(SUM(CASE WHEN lang != cls AND pred_lang = cls
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |         CAST(SUM(CASE WHEN lang = cls AND pred_lang != cls
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |         CAST(SUM(CASE WHEN lang != cls AND pred_lang != cls
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM j CROSS JOIN dim GROUP BY 1)
         |SELECT cls, tp, fp, fn, tn, ${MccFormula.mcc4} AS mcc4
         |FROM m ORDER BY cls ASC NULLS FIRST""".stripMargin,

    // the NB replay: identical train/test buckets, identical token
    // count model, the same 6dp-quantized decimal score staging and
    // (score DESC, plang ASC) argmax
    "q250_nb_langid" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, toks,
         |         CAST(len(toks) AS BIGINT) AS n_tok,
         |         (${Sql.charHash("text")}) % 10 AS bucket
         |  FROM (SELECT doc_id, lang, text, ${Sql.tokens("text")} AS toks
         |        FROM documents) z
         |  WHERE len(toks) >= 1),
         |tr AS (SELECT * FROM d WHERE bucket < 8),
         |te AS (SELECT * FROM d WHERE bucket >= 8),
         |trt AS (SELECT lang AS plang, unnest(toks) AS tok FROM tr),
         |cnt AS (SELECT plang, tok, COUNT(*) AS cnt FROM trt GROUP BY 1, 2),
         |tot AS (SELECT plang, CAST(SUM(cnt) AS BIGINT) AS tot
         |        FROM cnt GROUP BY 1),
         |vv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM cnt),
         |pri AS (SELECT lang AS plang, COUNT(*) AS nd FROM tr GROUP BY 1),
         |nt AS (SELECT COUNT(*) AS ntrain FROM tr),
         |ls AS (
         |  SELECT p.plang,
         |         CAST(ROUND(ln(CAST(p.nd AS DOUBLE) / nt.ntrain), 6)
         |              AS DECIMAL(12,6)) AS prior,
         |         CAST(ROUND(ln(CAST(t.tot + vv.v AS DOUBLE)), 6)
         |              AS DECIMAL(12,6)) AS pen
         |  FROM pri p JOIN tot t USING (plang)
         |  CROSS JOIN vv CROSS JOIN nt),
         |tet AS (SELECT doc_id, unnest(toks) AS tok FROM te),
         |seen AS (
         |  SELECT t.doc_id, c.plang,
         |         CAST(SUM(CAST(ROUND(ln(CAST(c.cnt + 1 AS DOUBLE)), 6)
         |                  AS DECIMAL(38,6))) AS DECIMAL(26,6)) AS ssum
         |  FROM tet t JOIN cnt c USING (tok) GROUP BY 1, 2),
         |sc AS (
         |  SELECT te.doc_id, te.lang, ls.plang,
         |         COALESCE(seen.ssum, CAST(0 AS DECIMAL(26,6)))
         |           - CAST(te.n_tok AS DECIMAL(12,0)) * ls.pen
         |           + ls.prior AS score
         |  FROM te CROSS JOIN ls
         |  LEFT JOIN seen ON seen.doc_id = te.doc_id
         |             AND seen.plang = ls.plang),
         |pr AS (
         |  SELECT doc_id, lang, plang AS pred_lang FROM sc
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, plang ASC) = 1)
         |SELECT lang, pred_lang, COUNT(*) AS n_docs
         |FROM pr GROUP BY 1, 2
         |ORDER BY lang ASC NULLS FIRST, pred_lang ASC NULLS FIRST"""
        .stripMargin,

    // the fold key threads through every CTE: complement train counts
    // from the shared global/per-fold aggs, scoring joins carry
    // (tok, fold), the same q250 decimal ln staging
    "q270_nb_crossval" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, toks,
         |         CAST(len(toks) AS BIGINT) AS n_tok,
         |         ((${Sql.charHash("text")}) % 10) // 2 AS fold
         |  FROM (SELECT doc_id, lang, text, ${Sql.tokens("text")} AS toks
         |        FROM documents) z
         |  WHERE len(toks) >= 1),
         |occ AS (SELECT doc_id, lang, fold, unnest(toks) AS tok FROM d),
         |cf AS (SELECT lang AS plang, tok, fold, COUNT(*) AS c
         |       FROM occ GROUP BY 1, 2, 3),
         |cg AS (SELECT plang, tok, CAST(SUM(c) AS BIGINT) AS cg
         |       FROM cf GROUP BY 1, 2),
         |folds AS (SELECT unnest(range(0, 5)) AS fold),
         |tc AS (
         |  SELECT f.fold, g.plang, g.tok, g.cg - COALESCE(cf.c, 0) AS tc
         |  FROM cg g CROSS JOIN folds f
         |  LEFT JOIN cf ON cf.plang = g.plang AND cf.tok = g.tok
         |              AND cf.fold = f.fold
         |  WHERE g.cg - COALESCE(cf.c, 0) > 0),
         |tot AS (SELECT fold, plang, CAST(SUM(tc) AS BIGINT) AS tot
         |        FROM tc GROUP BY 1, 2),
         |v AS (SELECT fold, CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
         |      FROM tc GROUP BY 1),
         |ndf AS (SELECT fold, lang AS plang, COUNT(*) AS ndf
         |        FROM d GROUP BY 1, 2),
         |ndg AS (SELECT lang AS plang, COUNT(*) AS ndg FROM d GROUP BY 1),
         |nf AS (SELECT fold, COUNT(*) AS nf FROM d GROUP BY 1),
         |ng AS (SELECT COUNT(*) AS ng FROM d),
         |pri AS (
         |  SELECT f.fold, g.plang, g.ndg - COALESCE(n.ndf, 0) AS nd
         |  FROM ndg g CROSS JOIN folds f
         |  LEFT JOIN ndf n ON n.plang = g.plang AND n.fold = f.fold
         |  WHERE g.ndg - COALESCE(n.ndf, 0) > 0),
         |ntr AS (SELECT nf.fold, ng.ng - nf.nf AS ntrain
         |        FROM nf CROSS JOIN ng),
         |ls AS (
         |  SELECT p.fold, p.plang,
         |         CAST(ROUND(ln(CAST(p.nd AS DOUBLE) / ntr.ntrain), 6)
         |              AS DECIMAL(12,6)) AS prior,
         |         CAST(ROUND(ln(CAST(t.tot + v.v AS DOUBLE)), 6)
         |              AS DECIMAL(12,6)) AS pen
         |  FROM pri p JOIN tot t ON t.fold = p.fold AND t.plang = p.plang
         |  JOIN v ON v.fold = p.fold JOIN ntr ON ntr.fold = p.fold),
         |seen AS (
         |  SELECT o.doc_id, t.plang,
         |         CAST(SUM(CAST(ROUND(ln(CAST(t.tc + 1 AS DOUBLE)), 6)
         |                  AS DECIMAL(38,6))) AS DECIMAL(26,6)) AS ssum
         |  FROM occ o JOIN tc t ON t.tok = o.tok AND t.fold = o.fold
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT d.doc_id, d.lang, d.fold, ls.plang,
         |         COALESCE(seen.ssum, CAST(0 AS DECIMAL(26,6)))
         |           - CAST(d.n_tok AS DECIMAL(12,0)) * ls.pen
         |           + ls.prior AS score
         |  FROM d JOIN ls ON ls.fold = d.fold
         |  LEFT JOIN seen ON seen.doc_id = d.doc_id
         |             AND seen.plang = ls.plang),
         |pr AS (
         |  SELECT fold, lang, plang FROM sc
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, plang ASC) = 1)
         |SELECT fold, COUNT(*) AS n_test,
         |       CAST(SUM(CASE WHEN plang = lang THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_correct,
         |       ROUND(CAST(SUM(CASE WHEN plang = lang THEN 1 ELSE 0 END)
         |                  AS DOUBLE) / COUNT(*), 4) AS acc4
         |FROM pr GROUP BY fold
         |ORDER BY fold ASC NULLS FIRST""".stripMargin,

    "q72_quality_score" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |         CAST(len($sqlToks) AS BIGINT) AS n_tok,
         |         CAST(len($sqlTokSet) AS BIGINT) AS n_uniq,
         |         CAST(list_sum(list_transform($sqlToks, t -> len(t))) AS BIGINT) AS sum_len
         |  FROM documents)
         |SELECT doc_id, n_tok, n_uniq,
         |       ROUND(CAST(n_uniq AS DOUBLE) / n_tok, 4) AS ttr,
         |       ROUND(CAST(sum_len AS DOUBLE) / n_tok, 4) AS avg_tok_len,
         |       ROUND(least(CAST(1 AS DOUBLE), n_tok / 50.0)
         |             * (CAST(n_uniq AS DOUBLE) / n_tok), 4) AS quality
         |FROM q ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "q73_token_count" ->
      s"""SELECT doc_id,
         |       CAST(len($sqlToks) AS BIGINT) AS n_ws,
         |       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_alpha,
         |       CAST(ceil(n_chars / 4.0) AS BIGINT) AS bpe_est
         |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "q74_fingerprint" ->
      s"""SELECT doc_id, ${Sql.charHash("text")} AS fp,
         |       ${Sql.charHash("text")} * 2654435761 AS fp_spread
         |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "q98_surprisal" ->
      s"""WITH dt AS (
         |  SELECT doc_id, unnest($sqlToks) AS tok FROM documents
         |), tf AS (SELECT tok, COUNT(*) AS tf FROM dt GROUP BY tok),
         |n AS (SELECT CAST(SUM(tf) AS DOUBLE) AS n_total FROM tf)
         |SELECT dt.doc_id, COUNT(*) AS n_tok,
         |       ROUND(CAST(SUM(CAST(ROUND(ln(n.n_total / tf.tf), 6)
         |                          AS DECIMAL(38,6))) AS DOUBLE)
         |             / COUNT(*), 4) AS surprisal4
         |FROM dt JOIN tf ON dt.tok = tf.tok CROSS JOIN n
         |GROUP BY dt.doc_id
         |ORDER BY dt.doc_id ASC NULLS FIRST""".stripMargin,

    "q184_regexp_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '[aeiou]{2}')))
        |    AS BIGINT) AS n_vruns,
        |  CAST(SUM(CASE WHEN regexp_matches(text, '^[A-Z]')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_capital
        |FROM documents GROUP BY 1 ORDER BY lang ASC NULLS FIRST""".stripMargin,

    // regexp_replace takes the 'g' flag: DuckDB replaces only the FIRST
    // match by default, Spark is always global
    "q222_pii_redact" -> {
      val h = Sql.charHash("red")
      """WITH src AS (
        |  SELECT c_mktsegment,
        |    c_name || ' <' || lower(regexp_replace(c_name, ' ', '.', 'g'))
        |      || '@example.com> phone 555-'
        |      || CAST(c_custkey % 10000 AS VARCHAR) AS txt
        |  FROM customer),
        |red AS (
        |  SELECT c_mktsegment, txt,
        |    regexp_replace(
        |      regexp_replace(txt, '[a-z0-9.#]+@[a-z.]+', '<EMAIL>', 'g'),
        |      '[0-9]{3,}', '<NUM>', 'g') AS red
        |  FROM src)
        |SELECT c_mktsegment, COUNT(*) AS n_rows,
        |  CAST(SUM(len(regexp_extract_all(txt, '[a-z0-9.#]+@[a-z.]+')))
        |    AS BIGINT) AS n_emails,
        |  CAST(SUM(length(red)) AS BIGINT) AS sum_len,
        |  CAST(SUM(HS) AS BIGINT) AS hsum
        |FROM red GROUP BY 1
        |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin
        .replace("HS", h)
    }
  )
}
