package graft.api

import graft.Dets.safeDiv
import graft.functions.{CentroidAggregator, GraftFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-facing embedding/vector operators over ARBITRARY DataFrames with
  * a float-array column — similarity search, near-dup pairs, centroids.
  * These back the hash-verified q62/q63/q69/q70 queries (see
  * [[graft.operators.VectorQueries]] for the bindings); the persisted
  * two-stage ANN index lives in [[graft.sources.IvfIndex]].
  *
  * All dot products run through the codegen `graft_dot` expression (a
  * primitive float loop inside whole-stage codegen), and squared norms
  * are computed ONCE per row before any pair join, so each candidate
  * pair costs one dot product, not three.
  */
object VectorOps {

  /** cos(a, b) from precomputed squared norms. */
  private def cosWith(a: String, b: String, n2a: String, n2b: String): Column =
    safeDiv(expr(s"graft_dot($a, $b)"), sqrt(col(n2a)) * sqrt(col(n2b)))

  /** `corpus` plus a squared-norm column `n2` — compute once, reuse in
    * every pair op below. */
  def withNorm(corpus: DataFrame, vecCol: String): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    // call_function binds the column by value — any column name works
    corpus.withColumn("n2",
      call_function("graft_dot", col(vecCol), col(vecCol)))
  }

  /** Exact top-`k` cosine neighbours in `corpus` for every row of
    * `probes` (columns `probe_id`, `pe`). Returns
    * (probe_id, id, cos, rn). The probe set broadcasts — the corpus
    * never shuffles — and ranking runs through the bounded-heap top-k
    * operator, so each scan partition contributes at most k rows per
    * probe to the final exchange. Cosines are rounded to 4dp with the
    * corpus id as tie-break, making the result deterministic. */
  def cosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
    probes: DataFrame, k: Int): DataFrame = {
    val c = withNorm(corpus, vecCol)
    val p = withNorm(probes.select(col("probe_id"), col("pe")), "pe")
      .select(col("probe_id"), col("pe"), col("n2").as("pn2"))
    graft.plans.GraftOps.topKPerGroup(
      broadcast(p).join(c, col(idCol) =!= col("probe_id"))
        .withColumn("cos", round(cosWith("pe", vecCol, "pn2", "n2"), 4))
        .select(col("probe_id"), col(idCol).as("id"), col("cos")),
      Seq(col("probe_id")),
      Seq(col("cos").desc, col("id").asc), k)
  }

  /** All corpus pairs with cosine ≥ `minCos` (id_lo < id_hi) — embedding
    * near-dup detection. Brute-force O(n²) pair scan with the broadcast
    * build side: exact and fine while one side's (id, vector, norm) rows
    * broadcast; past that, block by an IVF cell id (build one with
    * [[graft.sources.IvfIndex.build]]) and run this per cell. */
  def cosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
    minCos: Double): DataFrame = {
    val c = withNorm(corpus, vecCol)
    val a = c.select(col(idCol).as("id_lo"), col(vecCol).as("pe"),
      col("n2").as("pn2"))
    val b = c.select(col(idCol).as("id_hi"), col(vecCol), col("n2"))
    broadcast(a).join(b, col("id_lo") < col("id_hi"))
      .withColumn("cos", round(cosWith("pe", vecCol, "pn2", "n2"), 4))
      .filter(col("cos") >= minCos)
      .select("id_lo", "id_hi", "cos")
  }

  /** Per-group mean vector via the typed [[CentroidAggregator]] UDAF
    * (vector-add merge — commutative, so partial aggregation across
    * partitions is exact). Returns (group, centroid, n). */
  def centroids(corpus: DataFrame, groupCol: String, vecCol: String,
    dim: Int): DataFrame = {
    val centroid = udaf(new CentroidAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    corpus.groupBy(col(groupCol).as("group"))
      .agg(centroid(col(vecCol)).as("centroid"), count(lit(1)).as("n"))
  }
}
