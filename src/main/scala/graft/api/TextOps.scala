package graft.api

import graft.Dets.safeDiv
import graft.functions.{GraftFunctions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-facing text-analysis and text-dedup operators over ARBITRARY
  * DataFrames — the library surface behind the `documents`-table queries
  * in [[graft.operators.TextQueries]] / [[graft.operators.TfidfQueries]]
  * (which bind these to the test schema and are hash-verified against the
  * DuckDB oracle at every gate run).
  *
  * Conventions:
  *  - every op takes the input DataFrame plus the COLUMN NAMES it should
  *    read, and appends/returns deterministic columns — no fixed schema;
  *  - all hashing is the engine-portable rolling hash family from
  *    [[graft.functions.TextFunctions]] (64-bit integer ops only), so
  *    results are reproducible across engines and cluster sizes;
  *  - everything stays inside whole-stage codegen (native expressions
  *    from [[graft.functions.GraftFunctions]], no Scala UDFs, no
  *    interpreted higher-order-function lambdas on per-token paths).
  *
  * Pair-generating ops follow a shared shape: build one small hash row
  * per document ([[tokenHashTable]]), self-join blocked on a coarse key,
  * and verify candidates with the codegen sorted-merge intersect. For
  * corpora where even the blocked self-join is too wide, use the
  * MinHash/LSH candidate generation in [[DedupOps.minhashLshPairs]] and
  * keep the same verify step.
  */
object TextOps {

  /** One row per document: (`id`, `block`, `hs`) where `hs` is the SORTED
    * array of distinct-token rolling hashes — the compact representative
    * every pair op compares instead of the raw text. Sorting makes the
    * pairwise intersect a linear merge (`graft_sorted_intersect`).
    * `blockCol` is the candidate-blocking key (e.g. language); pass a
    * constant column to disable blocking. */
  def tokenHashTable(docs: DataFrame, idCol: String, textCol: String,
    blockCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("__toks", TextFunctions.tokenSet(col(textCol)))
      .withColumn("hs", array_sort(expr("graft_token_hashes(__toks)")))
      .select(col(idCol).as("id"), col(blockCol).as("block"), col("hs"))
  }

  /** Exact near-duplicate pairs from a [[tokenHashTable]]: same block,
    * `id_lo < id_hi`, token-set Jaccard ≥ `minJac`. Returns
    * (id_lo, id_hi, jac). The size-ratio prune
    * (J(A,B) ≤ min|A|,|B| / max|A|,|B|) skips the merge-intersect for
    * most pairs without changing the result set. */
  def nearDupPairs(hashed: DataFrame, minJac: Double): DataFrame =
    blockedPairs(hashed)
      .filter(safeDiv(least(size(col("hs_a")), size(col("hs_b"))).cast("double"),
        greatest(size(col("hs_a")), size(col("hs_b")))) >= minJac)
      .withColumn("inter",
        expr("graft_sorted_intersect(hs_a, hs_b)").cast("double"))
      .withColumn("jac", safeDiv(col("inter"),
        size(col("hs_a")) + size(col("hs_b")) - col("inter")))
      .filter(col("jac") >= minJac)
      .select(col("id_lo"), col("id_hi"), col("jac"))

  /** Containment pairs from a [[tokenHashTable]]: catches what Jaccard
    * misses — a short document quoted whole inside a long one has high
    * |A∩B|/|A| but low Jaccard. No size-ratio prune applies (the smaller
    * side can always be fully contained). Returns
    * (id_lo, id_hi, c_lo, c_hi) where `c_lo` = |A∩B|/|A|. */
  def containmentPairs(hashed: DataFrame, minCont: Double): DataFrame =
    blockedPairs(hashed)
      .withColumn("inter",
        expr("graft_sorted_intersect(hs_a, hs_b)").cast("double"))
      .withColumn("c_lo", safeDiv(col("inter"), size(col("hs_a"))))
      .withColumn("c_hi", safeDiv(col("inter"), size(col("hs_b"))))
      .filter(greatest(col("c_lo"), col("c_hi")) >= minCont)
      .select("id_lo", "id_hi", "c_lo", "c_hi")

  private def blockedPairs(hashed: DataFrame): DataFrame = {
    val a = hashed.select(col("id").as("id_lo"), col("block"),
      col("hs").as("hs_a"))
    val b = hashed.select(col("id").as("id_hi"), col("block").as("block_b"),
      col("hs").as("hs_b"))
    a.join(b, col("block") === col("block_b") && col("id_lo") < col("id_hi"))
  }

  /** N-gram-profile language identification over a self-labeled corpus:
    * build a top-`profileSize` distinct-token profile per language from
    * `langCol`, then predict for every document the language whose
    * profile it shares the most distinct tokens with. Returns
    * (id, pred_lang, score). The exploded (id, lang, token) table feeds
    * both the profile build and the scoring join, so it is persisted and
    * tokenization runs once. Both rankings run through the bounded-heap
    * top-k operator — the profile build is skew-prone (one group per
    * language) and the per-doc argmax needs no full sort. */
  def languageId(docs: DataFrame, idCol: String, textCol: String,
    langCol: String, profileSize: Int = 20): DataFrame = {
    val doctok = docs
      .select(col(idCol).as("__id"), col(langCol).as("__lang"),
        explode(TextFunctions.tokenSet(col(textCol))).as("tok"))
      .persist()
    val prof = graft.plans.GraftOps.topKPerGroup(
      doctok.groupBy(col("__lang").as("plang"), col("tok"))
        .agg(count(lit(1)).as("cnt")),
      Seq(col("plang")),
      Seq(col("cnt").desc, col("tok").asc), profileSize, rankName = "rk")
      .select("plang", "tok")
    val score = doctok.select("__id", "tok").join(prof, "tok")
      .groupBy("__id", "plang")
      .agg(count(lit(1)).as("score"))
    graft.plans.GraftOps.topKPerGroup(score,
      Seq(col("__id")),
      Seq(col("score").desc, col("plang").asc), 1, rankName = "rk")
      .select(col("__id").as("id"), col("plang").as("pred_lang"), col("score"))
  }

  /** Heuristic quality signals, appended per row: token count `n_tok`,
    * distinct count `n_uniq`, type-token ratio `ttr`, `avg_tok_len`, and
    * a length-damped composite `quality` in [0,1]. Pure projection —
    * codegen, no shuffle, linear scan at any scale. */
  def qualityScore(docs: DataFrame, textCol: String,
    fullLengthTokens: Int = 50): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("__tk", TextFunctions.tokens(col(textCol)))
      .withColumn("n_tok", size(col("__tk")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(col("__tk"))).cast("long"))
      .withColumn("__sum_len", expr("CAST(graft_sum_lengths(__tk) AS BIGINT)"))
      .withColumn("ttr",
        round(safeDiv(col("n_uniq").cast("double"), col("n_tok")), 4))
      .withColumn("avg_tok_len",
        round(safeDiv(col("__sum_len").cast("double"), col("n_tok")), 4))
      .withColumn("quality",
        round(least(lit(1.0), col("n_tok") / fullLengthTokens.toDouble) *
          safeDiv(col("n_uniq").cast("double"), col("n_tok")), 4))
      .drop("__tk", "__sum_len")
  }

  /** Token-count estimators, appended per row: whitespace tokens `n_ws`,
    * alphabetic runs `n_alpha`, and the chars/4 BPE estimate `bpe_est`.
    * `charCountCol` names a precomputed character-count column; when
    * absent the text length is used. */
  def tokenCounts(docs: DataFrame, textCol: String,
    charCountCol: Option[String] = None): DataFrame =
    docs
      .withColumn("n_ws",
        size(TextFunctions.tokens(col(textCol))).cast("long"))
      .withColumn("n_alpha",
        regexp_count(col(textCol), lit("[a-z]+")).cast("long"))
      .withColumn("bpe_est",
        ceil(charCountCol.map(col).getOrElse(length(col(textCol))) / 4.0)
          .cast("long"))

  /** Deterministic rolling-hash fingerprint `fp` of the text, appended.
    * Engine-portable (x31 mod 1e9+7 over chars, seed 7): any SQL engine
    * with BIGINT arithmetic reproduces it exactly. */
  def fingerprint(docs: DataFrame, textCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // call_function binds the column by value — any column name works
    docs.withColumn("fp", call_function("graft_charhash", col(textCol)))
  }

  /** Highest-TF-IDF term per document: tokenize, count term frequency per
    * (doc, term) and document frequency per term — two map-side partial
    * aggregations joined on the term, the corpus size attached as a
    * broadcast single-row aggregate — then take the per-doc argmax through
    * the bounded-heap top-k. Returns (id, top_term, tfidf). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val tok = docs.select(col(idCol).as("__id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    // tf feeds both the df-count and the final join; persist so the
    // tokenize+explode+agg chain runs once
    val tf = tok.groupBy("__id", "tok").agg(count(lit(1)).as("cnt"))
      .persist()
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    graft.plans.GraftOps.topKPerGroup(
      tf.join(df, "tok").crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("cnt") * log(col("n_docs").cast("double") / col("df")), 4))
        .select("__id", "tok", "tfidf"),
      Seq(col("__id")),
      Seq(col("tfidf").desc, col("tok").asc), 1)
      .select(col("__id").as("id"), col("tok").as("top_term"), col("tfidf"))
  }

  /** Word-bigram-shingle Jaccard pairs: same blocking/verify shape as
    * [[nearDupPairs]] but over hashed "a b" shingles
    * (`graft_bigram_hashes` folds each shingle straight to its hash — no
    * concatenated-string materialization). Returns (id_lo, id_hi, jac). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
    blockCol: String, minJac: Double): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val hashed = docs
      .withColumn("__tk", TextFunctions.tokens(col(textCol)))
      .filter(size(col("__tk")) >= 2)
      .withColumn("hs",
        array_sort(array_distinct(expr("graft_bigram_hashes(__tk)"))))
      .select(col(idCol).as("id"), col(blockCol).as("block"), col("hs"))
      // both self-join sides read this chain; persist so the shingle
      // hashing runs once (one small row of sorted hashes per doc)
      .persist()
    nearDupPairs(hashed, minJac)
  }
}
