package graft

import graft.operators.{PipelineQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Invariants of the training-pipeline ETL operators (q77–q81) beyond
  * the DuckDB hash gate: structural properties that must hold for ANY
  * corpus, not just the fixture. */
class PipelineSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q77 clusters: one row per doc, root is component-min, edges intra-cluster") {
    val docs = Tables.load(spark, Sf, "documents").count()
    val c = q("q77_dedup_cluster").cache()
    assert(c.count() == docs)
    // root property: cluster_id is itself clustered to cluster_id, keep=1 there
    val roots = c.filter(col("doc_id") === col("cluster_id"))
    assert(roots.filter(col("keep") =!= 1).count() == 0)
    assert(c.filter(col("cluster_id") > col("doc_id")).count() == 0)
    // every near-dup edge has both endpoints in the same cluster
    val e = TextQueries.nearDupPairs(spark, Sf, 0.6).select("id_lo", "id_hi")
    val lab = c.select(col("doc_id"), col("cluster_id"))
    val viol = e
      .join(lab.withColumnRenamed("doc_id", "id_lo")
        .withColumnRenamed("cluster_id", "c_lo"), "id_lo")
      .join(lab.withColumnRenamed("doc_id", "id_hi")
        .withColumnRenamed("cluster_id", "c_hi"), "id_hi")
      .filter(col("c_lo") =!= col("c_hi")).count()
    assert(viol == 0, s"$viol near-dup edges cross cluster boundaries")
    c.unpersist()
  }

  test("q118/q119 LSH-edge compositions: refinement of the exact forms") {
    // LSH edges are a SUBSET of the exact jac ≥ 0.6 relation (candidates
    // filtered by the same verify), so the LSH components REFINE the
    // exact components. Consequences asserted here, valid for any
    // corpus: (a) every source-pair edge count in q119 is ≤ q100's;
    // (b) q118's f_near keep-set contains q116's (each coarse cluster's
    // min id is also the min of its refined cluster); (c) all other
    // flags are edge-source-independent and must match row-for-row.
    val exact = q("q100_source_overlap").withColumnRenamed("n_pairs", "n_x")
    val lsh = q("q119_overlap_lsh")
    val over = lsh.join(exact, Seq("source_lo", "source_hi"), "left")
      .filter(col("n_x").isNull || col("n_pairs") > col("n_x")).count()
    assert(over == 0, "q119 has a source pair with more edges than q100")

    val c116 = q("q116_curation_run").cache()
    val c118 = q("q118_curation_lsh").cache()
    assert(c116.count() == c118.count())
    val j = c116.select(col("doc_id"), col("f_near").as("near_x"),
        col("f_quality").as("q_x"), col("f_exact").as("e_x"),
        col("f_clean").as("c_x"))
      .join(c118, "doc_id").cache()
    assert(j.filter(col("near_x") === 1 && col("f_near") === 0).count() == 0,
      "a doc kept by the exact near-dup stage was dropped by the LSH stage")
    assert(j.filter(col("q_x") =!= col("f_quality") ||
      col("e_x") =!= col("f_exact") ||
      col("c_x") =!= col("f_clean")).count() == 0,
      "an edge-source-independent flag differs between q116 and q118")
    j.unpersist(); c116.unpersist(); c118.unpersist()
  }

  test("q120 confusion matrix: reconciles with q71 row-for-row") {
    val conf = q("q120_lang_confusion").cache()
    val pred = q("q71_lang_id").cache()
    // total docs in the matrix == docs that received a prediction
    assert(conf.agg(sum("n_docs")).head.getLong(0) == pred.count())
    // and each cell is exactly the q71 count for that (lang, pred) pair
    val recounted = pred.groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n_re"))
    assert(conf.join(recounted, Seq("lang", "pred_lang"), "full_outer")
      .filter(col("n_docs").isNull || col("n_re").isNull ||
        col("n_docs") =!= col("n_re")).count() == 0)
    conf.unpersist(); pred.unpersist()
  }

  test("q121 novelty: every gram attributed once, bounds hold") {
    val nv = q("q121_gram_novelty").cache()
    // each distinct corpus gram is novel for exactly its min-doc_id
    // owner: Σ n_novel == |gram vocabulary|, recomputed independently
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    graft.functions.GraftFunctions.register(spark)
    val vocab = docs.select(explode(array_distinct(
        call_function("graft_ngram_hashes",
          call_function("graft_token_hashes",
            graft.functions.TextFunctions.tokens(col("text"))),
          lit(8)))).as("g"))
      .distinct().count()
    assert(nv.agg(sum("n_novel")).head.getLong(0) == vocab)
    assert(nv.filter(col("n_novel") > col("n_distinct")).count() == 0)
    // the first doc with any grams owns all of its grams
    val firstDoc = nv.filter(col("n_distinct") > 0)
      .orderBy("doc_id").select("doc_id", "novelty4").head
    assert(firstDoc.getDouble(1) == 1.0)
    nv.unpersist()
  }

  test("q78 split: buckets 0-9, split names consistent, assignment total") {
    val s = q("q78_train_split").cache()
    assert(s.filter(col("bucket") < 0 || col("bucket") > 9).count() == 0)
    val bad = s.filter(
      (col("bucket") < 8 && col("split") =!= "train") ||
        (col("bucket") === 8 && col("split") =!= "val") ||
        (col("bucket") === 9 && col("split") =!= "test")).count()
    assert(bad == 0)
    assert(s.count() == Tables.load(spark, Sf, "documents").count())
    s.unpersist()
  }

  test("q79 packing: bins contiguous and non-decreasing per lang") {
    import org.apache.spark.sql.expressions.Window
    val p = q("q79_pack_tokens")
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val viol = p.withColumn("prev_bin", lag("bin", 1).over(w))
      .filter(col("prev_bin").isNotNull && col("bin") < col("prev_bin"))
      .count()
    assert(viol == 0, "bin decreased within a lang")
    // bin must equal exclusive-cumsum div budget (recomputed independently)
    val chk = p.withColumn("cum",
        coalesce(sum("n_tok").over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .filter(col("bin") =!= expr("cum DIV 2048")).count()
    assert(chk == 0)
  }

  test("q83 chunks: contiguous ids, bounded width, exact tail coverage") {
    val c = q("q83_chunk_tokens").cache()
    assert(c.filter(col("n_in_chunk") < 1 || col("n_in_chunk") > 100)
      .count() == 0)
    val perDoc = c.groupBy("doc_id").agg(
      min("chunk_id").as("mn"), max("chunk_id").as("mx"),
      count(lit(1)).as("k"))
    // ids are 0..k-1 with no gaps
    assert(perDoc.filter(col("mn") =!= 0 || col("mx") =!= col("k") - 1)
      .count() == 0)
    // the last chunk ends exactly at the doc's token count
    val docs = Tables.load(spark, Sf, "documents")
      .select(col("doc_id"), size(graft.functions.TextFunctions
        .tokens(col("text"))).as("n_tok"))
    val last = c.join(perDoc, "doc_id").filter(col("chunk_id") === col("mx"))
    val viol = last.join(docs, "doc_id")
      .filter(col("chunk_id") * 90 + col("n_in_chunk") =!= col("n_tok"))
      .count()
    assert(viol == 0)
    c.unpersist()
  }

  test("q80 sample: at most K per stratum, ranks contiguous from 1") {
    val s = q("q80_sample_stratified").cache()
    val perLang = s.groupBy("lang").agg(count(lit(1)).as("n"),
      min("rk").as("mn"), max("rk").as("mx"))
    assert(perLang.filter(col("n") > 20).count() == 0)
    assert(perLang.filter(col("mn") =!= 1 || col("mx") =!= col("n"))
      .count() == 0)
    s.unpersist()
  }

  test("q81 upsert: one row per user carrying that user's max ts") {
    val u = q("q81_upsert_latest").cache()
    assert(u.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    val maxTs = Tables.load(spark, Sf, "events")
      .groupBy("user_id").agg(max("ts").as("mx"))
    val viol = u.join(maxTs, "user_id")
      .filter(col("last_ts").cast("timestamp") =!= col("mx")).count()
    assert(viol == 0)
    u.unpersist()
  }

  test("q97 knn labels: one row per probe, majority vote recomputed") {
    val pred = q("q97_knn_label").collect()
    assert(pred.length == 10)
    assert(pred.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 5))
    // recompute the argmax on the driver from the top-k neighbor set
    val emb = Tables.load(spark, Sf, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val nn = graft.api.VectorOps.cosineTopK(
        emb.filter(col("vec_id") >= 10), "vec_id", "embedding", probes, 5)
      .join(emb.select(col("vec_id").as("id"), col("label")), "id")
      .select("probe_id", "label").collect()
      .groupBy(_.getLong(0))
    pred.foreach { r =>
      val votes = nn(r.getLong(0)).groupBy(_.getInt(1))
        .view.mapValues(_.size).toMap
      val (wantLabel, wantVotes) = votes.toSeq.sortBy {
        case (l, v) => (-v, l) }.head
      assert(r.getInt(2) == wantLabel && r.getLong(3) == wantVotes,
        s"probe ${r.getLong(0)}: got (${r.getInt(2)}, ${r.getLong(3)}), " +
          s"want ($wantLabel, $wantVotes)")
    }
  }

  test("q98 surprisal: token counts tie out and scores are positive") {
    val sup = q("q98_surprisal").cache()
    val docs = Tables.load(spark, Sf, "documents")
    // n_tok must equal the doc's whitespace token count (only docs with
    // ≥1 token appear)
    val withN = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .filter(col("n") > 0)
    assert(sup.count() == withN.count())
    assert(sup.join(withN, "doc_id")
      .filter(col("n_tok") =!= col("n")).count() == 0)
    // ln(N/tf) > 0 whenever the vocabulary has ≥ 2 distinct tokens
    assert(sup.filter(col("surprisal4") <= 0).count() == 0)
    sup.unpersist()
  }

  test("q100 overlap matrix: pair counts sum to the near-dup edge count") {
    val m = q("q100_source_overlap").cache()
    val edges = operators.TextQueries.nearDupPairs(spark, Sf, 0.6).count()
    val total = m.agg(sum("n_pairs")).head().getLong(0)
    assert(total == edges, s"matrix total $total != edge count $edges")
    assert(m.filter(col("source_lo") > col("source_hi")).count() == 0)
    m.unpersist()
  }

  test("q101 outliers: n sums to corpus size, sd nonneg, bound respected") {
    val o = q("q101_embed_outliers").cache()
    assert(o.agg(sum("n")).head().getLong(0) ==
      Tables.load(spark, Sf, "embeddings").count())
    assert(o.filter(col("sd4") < 0).count() == 0)
    // Chebyshev: at most n/4 rows can sit beyond 2σ
    assert(o.filter(col("n_out") > col("n") / 4).count() == 0)
    o.unpersist()
  }

  test("q99 dataset card: TOTAL row reconciles with per-source rows") {
    val card = q("q99_dataset_card").cache()
    val srcRows = card.filter(col("source") =!= "TOTAL")
    val tot = card.filter(col("source") === "TOTAL").head()
    assert(card.count() == srcRows.count() + 1)
    val sums = srcRows.agg(sum("n_docs"), sum("n_tokens")).head()
    assert(tot.getLong(1) == sums.getLong(0)) // n_docs
    assert(tot.getLong(5) == sums.getLong(1)) // n_tokens
    assert(tot.getLong(1) ==
      Tables.load(spark, Sf, "documents").count())
    // dup_rate within [0,1]; uniq ≤ docs on every row
    assert(card.filter(col("dup_rate") < 0 || col("dup_rate") > 1)
      .count() == 0)
    assert(card.filter(col("n_uniq") > col("n_docs")).count() == 0)
    card.unpersist()
  }

  test("q236 BPE merge: self-pair runs merge left-to-right without overlap") {
    import spark.implicits._
    // "aaaa"×3: pairs (a,a) count 3·3 = 9 → merge at pos 1 and 3 (run
    // parity), NOT 1-2-3 (overlap) → "aa","aa" (2 symbols). "aaab"×1:
    // matches at 1,2 → merge pos 1 only → "aa","a","b" (3 symbols).
    // Round 2 then merges the now-dominant (aa,aa) inside "aaaa".
    val words = Seq(("aaaa", 3L), ("aaab", 1L)).toDF("w", "wcnt")
    val tr = graft.operators.CorpusStatsQueries
      .bpeMergeTrace(spark, words, 2).collect()
    assert(tr.length == 2)
    val r1 = tr.head
    assert((r1.getString(1), r1.getString(2)) == ("a", "a"))
    assert(r1.getLong(3) == 11L, s"pair count ${r1.getLong(3)}") // 3·3+2
    // after round 1: "aaaa"→2 syms ×3 + "aaab"→3 syms ×1 = 9
    assert(r1.getLong(4) == 9L, s"n_sym_after ${r1.getLong(4)}")
    val r2 = tr(1)
    assert((r2.getString(1), r2.getString(2)) == ("aa", "aa"))
    assert(r2.getLong(3) == 3L)
    assert(r2.getLong(4) == 6L) // "aaaa"→1 sym ×3 + 3
  }
}
