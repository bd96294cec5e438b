package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers.
  *
  * At 100 TB a handful of hot keys (one giant customer, one near-dup
  * mega-cluster) can pin an entire aggregation or join on one reducer.
  * For ALGEBRAIC aggregates (counts, exact decimal sums, min/max) the
  * standard fix is two-phase salted aggregation: spread each hot key
  * over `salts` sub-keys, partially aggregate, then aggregate the
  * partials. Correctness requires associative+commutative aggregates —
  * which is exactly what the [D2] decimal-sum convention guarantees, so
  * salting never changes results here (asserted in SkewSpec).
  *
  * Joins against skewed keys are left to AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); this helper
  * covers the aggregation side AQE doesn't rewrite.
  */
object Skew {

  /** Deterministic pseudo-random salt in [0, salts) derived from a row's
    * columns (never from rand() — reruns must agree). */
  private def saltCol(cols: Seq[Column], salts: Int): Column =
    pmod(xxhash64(cols: _*), lit(salts))

  /** Two-phase salted sum/count: groupBy(keys :+ salt) partial, then
    * final groupBy(keys). `sums` maps output name -> column to
    * decimal-sum. The salt hashes EVERY input column plus a per-row
    * discriminator: hashing only keys+values would collapse back onto
    * one reducer exactly on the worst case (a hot key whose value
    * columns are constant — 10B identical rows is precisely what needs
    * spreading).
    *
    * Pass `discriminator` (a caller-side stable unique id, e.g. a
    * primary-key column) to make the salt fully deterministic per row —
    * the safe choice for any input with an upstream shuffle. Without
    * one the discriminator falls back to `monotonically_increasing_id`,
    * whose value depends on partition layout; a fetch-failure retry
    * that recomputes only SOME map tasks could then re-salt rows
    * differently mid-aggregate (SPARK-23207 class: rows double-counted
    * or dropped). To fail closed rather than silently corrupt, the
    * fallback pins the salted frame with `localCheckpoint`: retries
    * replay stored blocks, and losing an executor fails the job loudly
    * instead of re-deriving different salts. RESULTS are identical for
    * every salt assignment (associative+commutative [D2] sums; asserted
    * in SkewSpec). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
    sums: Map[String, Column],
    discriminator: Option[Column] = None): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val allCols = df.columns.map(col).toSeq
    val salted = discriminator match {
      case Some(d) =>
        df.withColumn("__salt", saltCol(allCols :+ d, salts))
      case None =>
        df.withColumn("__salt",
            saltCol(allCols :+ monotonically_increasing_id(), salts))
          .localCheckpoint()
    }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sums.map { case (name, c) =>
          sum(c.cast(graft.Dets.Dec)).as(name)
        }.toSeq: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        sums.keys.map(name => sum(col(name)).as(name)).toSeq: _*)
  }

  /** Two-phase per-group top-k for LOW-CARDINALITY groups. The direct
    * window form (`row_number over partitionBy(group)`) funnels ALL rows
    * of a group through one task — with 5 groups over 100 TB that is 5
    * reducers doing everything. Phase 1 takes top-k within each
    * (group, salt) — `salts`× the parallelism, each reducer seeing
    * ~1/salts of a group; phase 2 re-ranks the k×salts survivors per
    * group, which is tiny. Top-k is selection, not aggregation, so any
    * row in the true global top-k survives its salt bucket's local
    * top-k — results are identical to the direct form (asserted in
    * SkewSpec). `order` must be a total order for determinism.
    */
  def saltedTopK(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
    k: Int, salts: Int = 64): DataFrame = {
    require(k >= 1 && salts >= 1, "k and salts must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val keyCols = df.columns.map(col).toSeq
    val salted = df.withColumn("__salt", saltCol(keyCols, salts))
    val w1 = Window.partitionBy((groupCols :+ "__salt").map(col): _*)
      .orderBy(order: _*)
    val survivors = salted.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k).drop("__rn", "__salt")
    val w2 = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    survivors.withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
  }
}
