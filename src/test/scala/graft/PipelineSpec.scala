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
}
