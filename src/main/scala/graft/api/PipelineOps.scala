package graft.api

import graft.functions.{GraftFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-facing training-data-pipeline operators over ARBITRARY
  * DataFrames: deterministic splitting/sampling, token packing, document
  * chunking. These back the hash-verified q78/q79/q80/q83 queries (see
  * [[graft.operators.PipelineQueries]] for the bindings).
  *
  * Every assignment here is a pure function of row CONTENT (engine
  * -portable rolling hashes, never partition ids or RNG state), so the
  * same row lands in the same split/sample/chunk on any engine, any
  * cluster size, any run — the reproducibility property a training
  * pipeline actually needs. All per-row ops are pure projection
  * (codegen, no shuffle); the groupwise ops shuffle once on their key.
  */
object PipelineOps {

  /** Deterministic content-hash train/val/test split, appended as
    * (bucket, split): bucket = charhash(text) mod `buckets`, buckets
    * below `trainBuckets` are "train", the next `valBuckets` are "val",
    * the rest "test". */
  def trainSplit(docs: DataFrame, textCol: String, buckets: Int = 10,
    trainBuckets: Int = 8, valBuckets: Int = 1): DataFrame = {
    require(buckets > 0 && trainBuckets >= 0 && valBuckets >= 0 &&
      trainBuckets + valBuckets <= buckets,
      s"need trainBuckets + valBuckets <= buckets, got " +
        s"$trainBuckets + $valBuckets vs $buckets")
    GraftFunctions.register(docs.sparkSession)
    docs
      // call_function binds the column by value, not by splicing its
      // name into SQL text — works for any column name
      .withColumn("bucket", call_function("graft_charhash", col(textCol)) % buckets)
      .withColumn("split",
        when(col("bucket") < trainBuckets, "train")
          .when(col("bucket") < trainBuckets + valBuckets, "val")
          .otherwise("test"))
  }

  /** Deterministic stratified sample: `k` rows per `strataCol` group,
    * chosen by a multiplicative-spread hash of `keyCol` (pseudo-random
    * but exactly reproducible) with the key as tie-break. Returns the
    * sampled rows plus their in-stratum rank `rk`. Runs through the
    * bounded-heap top-k operator, so no stratum is ever sorted whole. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
    k: Int): DataFrame = {
    val mod = TextFunctions.HashMod
    // reduce mod 1e9+7 BEFORE the multiply: residue (<2^30) × spread
    // (<2^32) stays under 2^63, whereas key × spread overflows int64 (an
    // ANSI-mode throw) once the key exceeds ~3.47e9
    val spread = 2654435761L
    graft.plans.GraftOps.topKPerGroup(
      df.withColumn("__h", pmod(pmod(col(keyCol), lit(mod)) * spread, lit(mod))),
      Seq(col(strataCol)),
      Seq(col("__h").asc, col(keyCol).asc), k, rankName = "rk")
      .drop("__h")
  }

  /** Deterministic weighted mixture sample — the domain-mixing step of a
    * training-data pipeline: stratum `g` contributes floor(weights(g) ×
    * total) rows, chosen by the same multiplicative-spread hash order as
    * [[stratifiedSample]] (reproducible on any engine / cluster size).
    * Strata absent from `weights` contribute nothing. Returns the
    * sampled rows plus their in-stratum rank `rk`. One bounded-heap
    * top-k pass at k = max quota, then the per-stratum quota filter —
    * no stratum is ever sorted whole. */
  def mixtureSample(df: DataFrame, strataCol: String, keyCol: String,
    weights: Map[String, Double], total: Int): DataFrame = {
    require(total > 0, s"total must be positive, got $total")
    require(weights.nonEmpty && weights.values.forall(w => w >= 0 && w <= 1),
      "weights must be non-empty fractions in [0, 1]")
    val quotas = weights.map { case (k, w) => k -> (w * total).toLong }
    val maxQuota = quotas.values.max
    require(maxQuota >= 1, "largest quota rounds to zero rows")
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (k, q)) =>
      when(col(strataCol) === k, lit(q)).otherwise(acc)
    }
    val mod = TextFunctions.HashMod
    val spread = 2654435761L
    graft.plans.GraftOps.topKPerGroup(
      df.withColumn("__h",
        pmod(pmod(col(keyCol), lit(mod)) * spread, lit(mod))),
      Seq(col(strataCol)),
      Seq(col("__h").asc, col(keyCol).asc), maxQuota.toInt, rankName = "rk")
      .filter(col("rk") <= quota)
      .drop("__h")
  }

  /** Token-budget packing: per `groupCol`, walk rows in `orderCol` order
    * and assign each to the bin its preceding cumulative token count
    * fills — the deterministic "pack documents into training sequences"
    * assignment. Appends (n_tok, bin). One shuffle on the group key; the
    * running sum is a single window pass. */
  def packTokens(docs: DataFrame, groupCol: String, orderCol: String,
    textCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy(groupCol).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tok",
        size(TextFunctions.tokens(col(textCol))).cast("long"))
      .withColumn("__cum", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum DIV $budget"))
      .drop("__cum")
  }

  /** Token-budget mixture — the domain-mixing step when the budget is
    * TOKENS, not documents (what a pretraining mix actually
    * allocates): within each stratum, documents in the
    * [[stratifiedSample]] spread-hash order are kept while the
    * EXCLUSIVE cumulative token count stays below the stratum's
    * budget — so the last kept document may overshoot by at most
    * itself (the [[packTokens]] boundary convention; budgets are soft
    * by ≤ 1 document, never silently hard-truncated mid-document).
    * Appends (n_tok, cum_before). One keyed window per stratum —
    * parallel in strata, reproducible on any engine or cluster. */
  def tokenBudgetMix(docs: DataFrame, strataCol: String, keyCol: String,
    textCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val mod = TextFunctions.HashMod
    val spread = 2654435761L
    val w = Window.partitionBy(strataCol)
      .orderBy(col("__h").asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tok",
        size(TextFunctions.tokens(col(textCol))).cast("long"))
      .withColumn("__h",
        pmod(pmod(col(keyCol), lit(mod)) * spread, lit(mod)))
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .filter(col("cum_before") < budget)
      .drop("__h")
  }

  /** Overlapping token-window chunking: split each document into windows
    * of `width` tokens every `stride` tokens (overlap = width − stride).
    * Returns one row per chunk: (id, chunk_id, n_in_chunk, fp) where
    * `fp` is the rolling fingerprint of the chunk's token hashes —
    * dedup-able and engine-portable without materializing chunk text.
    * Pure explode + projection; rows with no tokens emit no chunks. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
    width: Int, stride: Int): DataFrame = {
    require(stride > 0 && width >= stride, "need 0 < stride <= width")
    GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("__tk", TextFunctions.tokens(col(textCol)))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)
      .select(col(idCol).as("id"), col("__tk"),
        posexplode(expr(s"sequence(0, __n - 1, $stride)"))
          .as(Seq("chunk_id", "__start")))
      .withColumn("__chunk", expr(s"slice(__tk, __start + 1, $width)"))
      .select(col("id"), col("chunk_id"),
        size(col("__chunk")).as("n_in_chunk"),
        expr("graft_chunk_fp(__chunk)").as("fp"))
  }

  /** Latest-wins compaction of an append-only log: one row per `keys`
    * group, the newest by `order` (must be total — include a unique id).
    * Delegates to the streaming module's batch core — the same semantics
    * the incremental foreachBatch snapshot path applies per micro-batch. */
  def latestWins(log: DataFrame, keys: Seq[Column], order: Seq[Column])
  : DataFrame =
    graft.streaming.EventStreams.latestWins(log, keys, order)

  /** Global row numbers without a single-partition window — re-export of
    * [[graft.functions.GlobalRank.rowNumber]] (range-repartition, rank
    * locally, shift by per-partition counts). */
  def globalRowNumber(df: DataFrame, order: Seq[Column]): DataFrame =
    graft.functions.GlobalRank.rowNumber(df, order)

  /** Bounded-heap per-group top-k — re-export of
    * [[graft.plans.GraftOps.topKPerGroup]]. */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column],
    k: Int, rankName: String = "rn"): DataFrame =
    graft.plans.GraftOps.topKPerGroup(df, keys, order, k, rankName)
}
