package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Relational model training — the learned-scorer stage of a curation
  * pipeline (the one stage the rule/surprisal gates q104/q98/q103 left
  * open: a TRAINABLE quality classifier distilled from labels).
  *
  * Everything here is INTEGER-EXACT by construction: features, labels,
  * margins, gradient sums, and weight updates are 64-bit integers, and
  * the one division per step (the mean-gradient learning rate 1/N)
  * truncates toward zero with the sign made explicit — so a SQL engine
  * replaying the unrolled steps reproduces the weights bit-for-bit
  * ([D5]; no float staging anywhere, unlike the 6dp-decimal pipelines
  * the iterative graph queries need).
  *
  * Scale shape: each training step is ONE full pass — a map-side
  * partial aggregation collapsing to a single row (no shuffle beyond
  * the 1-row combine), which is the irreducible cost of batch gradient
  * training at 100 TB. The feature projection is localCheckpointed
  * once so step k never replays the tokenization of steps 0..k−1; the
  * per-step weight vector (F+1 longs) is a bounded driver value folded
  * back into the next step's expressions as literals — the same
  * bounded-driver-finish convention as the PQ codebooks.
  */
object MlOps {

  /** Batch perceptron with mean-gradient updates, returning the full
    * training TRACE as a tiny DataFrame — one row per step `t`
    * (0..iters): `(step, n_mis, w_bias, w_<feature>...)` where the
    * weights are the model AFTER t updates and `n_mis` counts the
    * rows that model misclassifies (margin y·(w·x) ≤ 0; step 0 is the
    * zero model, so n_mis = N).
    *
    * Update rule per step: `w_j += trunc(Σ_mis y·x_j / N)` — the
    * classic perceptron gradient averaged over the training set so
    * weights stay bounded by iters × max|x| regardless of N (a raw
    * Σ update would overflow int64 margins near 10⁹ rows). `labelCol`
    * must be 0/1 (mapped to y = ±1); features must be integral and
    * non-negative. Rows with NULL label or features are dropped (a
    * NULL would poison every aggregate). N counts the TRAINING rows.
    */
  def perceptronTrace(df: DataFrame, featureCols: Seq[String],
    labelCol: String, iters: Int): DataFrame = {
    require(featureCols.nonEmpty && iters >= 0,
      "need at least one feature and iters >= 0")
    val spark = df.sparkSession
    val nW = featureCols.size + 1
    val y = (col(labelCol).cast("long") * 2 - 1).as("__y")
    val xs = lit(1L).as("__x0") +: featureCols.zipWithIndex.map {
      case (c, i) => col(c).cast("long").as(s"__x${i + 1}")
    }
    val f = df
      .filter(featureCols.map(col(_).isNotNull)
        .foldLeft(col(labelCol).isNotNull)(_ && _))
      .select(y +: xs: _*)
      .localCheckpoint(true)
    var w = Seq.fill(nW)(0L)
    val trace = Seq.newBuilder[Row]
    var t = 0
    while (t <= iters) {
      val margin = (0 until nW)
        .map(i => col(s"__x$i") * lit(w(i))).reduce(_ + _)
      val mis = col("__y") * margin <= 0
      val aggs =
        count(lit(1L)).as("n") +:
          sum(when(mis, 1L).otherwise(0L)).as("n_mis") +:
          (0 until nW).map(i =>
            sum(when(mis, col("__y") * col(s"__x$i")).otherwise(0L))
              .as(s"g$i"))
      val r = f.agg(aggs.head, aggs.tail: _*).head()
      trace += Row.fromSeq(t.toLong +: r.getAs[Long]("n_mis") +: w)
      if (t < iters) {
        val n = r.getAs[Long]("n")
        w = w.zipWithIndex.map { case (wi, i) =>
          val g = r.getAs[Long](s"g$i")
          // sign-explicit truncation toward zero: SQL floor-division
          // conventions differ on negatives, this form does not
          wi + (if (n == 0L) 0L else if (g < 0) -((-g) / n) else g / n)
        }
      }
      t += 1
    }
    val schema = StructType(
      StructField("step", LongType, nullable = false) ::
        StructField("n_mis", LongType, nullable = false) ::
        StructField("w_bias", LongType, nullable = false) ::
        featureCols.map(c =>
          StructField(s"w_$c", LongType, nullable = false)).toList)
    spark.createDataFrame(
      spark.sparkContext.parallelize(trace.result(), 1), schema)
  }

  /** Integer-exact unrolled Lloyd k-means over a float-vector column,
    * returning the per-round TRACE: one row per (round, cluster) with
    * the member count and the summed squared distance (inertia) of the
    * assignment that round — `round` r is evaluated against the
    * centroids after r−1 update steps.
    *
    * Determinism contract ([D5] throughout, the [[perceptronTrace]]
    * conventions applied to clustering):
    *   - vectors are quantized ONCE to integer units
    *     (`floor(double(x) · scale)` — IEEE-identical in any engine);
    *     every distance, sum, and centroid after that is 64-bit
    *     integer arithmetic, so a SQL replay is bit-exact;
    *   - seeds are the `k` rows with the smallest
    *     polyMix(id mod M) (ties by id), clusters numbered in that
    *     order — a portable pseudo-random draw, no RNG;
    *   - assignment ties break toward the lower cluster id;
    *   - centroid update is the sign-explicit truncating mean per
    *     dimension.
    *
    * Scale shape: per round one broadcast of k·dim centroid literals
    * into a codegen'd zip_with distance kernel (no join), one
    * (cluster, dim)-keyed partial aggregation, and a k·dim
    * driver-side fold — the PQ-codebook bounded-driver convention.
    * With milli-unit quantization (scale = 1e3) per-row distances stay
    * ≤ dim·4e6·scale² ≈ 1e9, so inertia sums hold to ~1e9 rows; past
    * that the inertia column (not the centroids) would need decimal
    * staging. */
  def kmeansTrace(df: DataFrame, idCol: String, vecCol: String,
    k: Int, iters: Int, scale: Long = 1000L): DataFrame = {
    require(k >= 1 && iters >= 1, "need k >= 1 and iters >= 1")
    val spark = df.sparkSession
    val hashM = graft.functions.TextFunctions.HashMod
    val e = df.select(col(idCol).cast("long").as("__id"),
        expr(s"transform($vecCol, x -> " +
          s"cast(floor(cast(x as double) * ${scale}L) as bigint))")
          .as("__e"))
      .filter(col("__e").isNotNull)
      .localCheckpoint(true)
    val dim = e.select(size(col("__e"))).head().getInt(0)
    // the trace's n_vecs/inertia come from the pos==0 slice of the
    // posexplode'd stats, so a size-0 vector would silently vanish from
    // the counts (r14 ADVICE) — name the precondition instead
    require(dim >= 1, s"kmeansTrace needs vectors of dim >= 1, got $dim")
    val seedIds = e.select(col("__id"),
        graft.operators.GraphQueries.polyMix(pmod(col("__id"), lit(hashM)))
          .as("__h"))
      .orderBy(col("__h").asc, col("__id").asc).limit(k)
      .collect().map(_.getLong(0))
    val seedVec = e.filter(col("__id").isin(seedIds.map(Long.box): _*))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).toArray).toMap
    var cents: Seq[Array[Long]] = seedIds.map(seedVec(_)).toSeq
    // single nested-literal kernel (the PqOps.pqIntTrain r14 form): the
    // k×dim centroid table is ONE typedLit plan node and the argmin is
    // a transform/array_min over it — same integer math and lower-id
    // tie-break as the per-cluster literal-array chain it replaces,
    // with O(1) plan size in k (the chain's analysis + codegen cost
    // grew with k and dominated small-data trace runs).
    def assigned = {
      val cLit = typedLit(cents.map(_.toSeq))
      e.withColumn("__cbs", cLit)
        .withColumn("__a", array_min(expr(
          s"transform(sequence(0, ${cents.size - 1}), c -> named_struct(" +
            "'dist', aggregate(zip_with(__e, __cbs[c], " +
            "(x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b), " +
            "'cl', CAST(c AS BIGINT)))")))
        .select(col("__id"), col("__e"),
          col("__a.cl").as("cl"), col("__a.dist").as("dist"))
    }
    // ONE distributed job per round (the PqOps.pqIntTrain r14 shape):
    // the (cl, pos)-keyed stats agg carries the centroid-update sums
    // AND the round's trace numbers (n_vecs / inertia = the pos-0
    // slice), and the k·iters trace rows assemble driver-side — the
    // earlier loop evaluated each round's assignment twice (sums
    // collect + trace-union member) and re-analyzed the iters-member
    // union of assignment plans at every trace action.
    val traceRows = Seq.newBuilder[Row]
    var r = 1
    while (r <= iters) {
      val a = assigned
      val stats = a.select(col("cl"), col("dist"), posexplode(col("__e")))
        .groupBy(col("cl"), col("pos"))
        .agg(sum("col").as("s"), count(lit(1)).as("n"),
          sum("dist").as("sd"))
        .collect()
      traceRows ++= stats.iterator
        .filter(_.getInt(1) == 0)
        .map(row => Row(r.toLong, row.getLong(0),
          row.getLong(3), row.getLong(4)))
      if (r < iters) {
        val sums = stats
          .map(row => (row.getLong(0), row.getInt(1)) ->
            (row.getLong(2), row.getLong(3))).toMap
        cents = cents.indices.map { j =>
          Array.tabulate(dim) { d =>
            sums.get((j.toLong, d)) match {
              case Some((g, n)) if n > 0 =>
                if (g < 0) -((-g) / n) else g / n
              case _ => cents(j)(d) // empty cluster keeps its centroid
            }
          }
        }
      }
      r += 1
    }
    val traceSchema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("cl", LongType, nullable = false),
      StructField("n_vecs", LongType, nullable = false),
      StructField("inertia", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        traceRows.result().sortBy(row =>
          (row.getLong(0), row.getLong(1))), 1), traceSchema)
      .orderBy("round", "cl")
  }

  /** Score rows with a trained weight vector (bias first, then one
    * weight per feature, the [[perceptronTrace]] layout): appends the
    * integer margin `score` = w·(1, x...). Positive margin = keep. */
  def linearScore(df: DataFrame, featureCols: Seq[String],
    weights: Seq[Long]): DataFrame = {
    require(weights.size == featureCols.size + 1,
      s"need ${featureCols.size + 1} weights (bias first), got ${weights.size}")
    val margin = (lit(1L) * lit(weights.head) +:
      featureCols.zip(weights.tail).map { case (c, wi) =>
        col(c).cast("long") * lit(wi)
      }).reduce(_ + _)
    df.withColumn("score", margin)
  }
}
