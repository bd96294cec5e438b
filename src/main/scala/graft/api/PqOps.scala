package graft.api

import graft.functions.{CentroidAggregator, GraftFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}

/** Product quantization + asymmetric-distance (ADC) search — the
  * memory-resident ANN path that complements [[graft.sources.IvfIndex]]
  * at 100 TB: instead of pruning WHICH vectors to score (IVF cells), PQ
  * compresses EVERY vector to `m` small codes (m bytes at ksub ≤ 256)
  * so the whole corpus's codes fit in a fraction of the raw footprint,
  * and a probe scores candidates by summing m table-looked-up
  * sub-distances instead of touching any raw vector.
  *
  * Scale shape: training runs on the deterministic spread-hash sample
  * (`trainOneIn`, the IvfIndex convention); all m subspaces train
  * TOGETHER in one distributed job per Lloyd iteration (the subvector
  * table carries a subspace column — no per-subspace driver loop over
  * the data); encoding is one broadcast-join pass over the corpus; ADC
  * search broadcasts a |probes|·m·ksub distance table and never moves
  * the codes — the only shuffle is the (probe, id) partial-sum, m rows
  * per pair collapsing map-side.
  *
  * Determinism [D2]: sub-distances are 6dp-rounded and decimal-summed;
  * assignment and ranking tie-break on (code, id); centroids are the
  * exact decimal means of [[CentroidAggregator]]; seeding is the
  * multiplicative-spread id hash — bit-identical on any partition
  * layout or cluster size.
  */
object PqOps {

  private val Spread = 2654435761L
  private def idHash(c: Column): Column =
    pmod(pmod(c, lit(TextFunctions.HashMod)) * Spread,
      lit(TextFunctions.HashMod))

  /** (keys..., j, sv) subvector table: vector split into `m` slices of
    * `dim / m` components. */
  private def subvectorsKeyed(df: DataFrame, keyCols: Seq[String],
    vecCol: String, dim: Int, m: Int): DataFrame = {
    val sub = dim / m
    df.select(keyCols.map(col) :+ explode(expr(
        s"transform(sequence(0, ${m - 1}), j -> " +
          s"named_struct('j', CAST(j AS INT), 'sv', " +
          s"slice($vecCol, j*$sub+1, $sub)))")).as("x"): _*)
      .select(keyCols.map(col) :+ col("x.j").as("j") :+
        col("x.sv").as("sv"): _*)
  }

  /** (id, j, sv) subvector table. */
  private def subvectors(emb: DataFrame, idCol: String, vecCol: String,
    dim: Int, m: Int): DataFrame =
    subvectorsKeyed(emb.select(col(idCol).as("id"), col(vecCol).as("v")),
      Seq("id"), "v", dim, m)

  /** Squared L2 between a subvector and a centroid via three dot
    * products, 6dp-rounded so assignment and ADC rank identically on
    * any engine. */
  private def l2sq(sv: String, cent: String): Column =
    round(call_function("graft_dot", col(sv), col(sv))
      - lit(2d) * call_function("graft_dot", col(sv), col(cent))
      + call_function("graft_dot", col(cent), col(cent)), 6)

  /** argmin-L2 code assignment: (id, j, code) — one broadcast of the
    * codebooks, ranking through the bounded-heap top-1 (no shuffle of
    * scored pairs). */
  private def assign(sv: DataFrame, cb: DataFrame): DataFrame =
    graft.plans.GraftOps.topKPerGroup(
      sv.join(broadcast(cb), Seq("j"))
        .select(col("id"), col("j"), col("code"), l2sq("sv", "cent").as("d")),
      Seq(col("id"), col("j")),
      Seq(col("d").asc, col("code").asc), 1, rankName = "__r")
      .select("id", "j", "code")

  /** graft_dot mirrored on the driver for double arrays: the same
    * left-fold Σ a[i]·b[i] over min(|a|,|b|) elements — used to
    * precompute codebook self-dots for [[assignLit]] bit-identically
    * to the in-plan `graft_dot(cent, cent)`. */
  private def dotDD(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** [[assign]] with the codebook as a COLLECTED driver-side model
    * (the int-kernel convention, [[pqIntTrain]]'s `assigned`): the
    * m-per-subspace (code, cent) lists ride three nested literals and
    * the argmin is a codegen'd transform/array_min — a pure map, no
    * broadcast exchange, no bounded-heap shuffle, no join back for
    * `sv`. Distances are the same l2sq tree, term for term:
    * round((graft_dot(sv,sv) − 2·graft_dot(sv,cent)) + cent·cent, 6)
    * with the self-dot precomputed by [[dotDD]] (same left fold); the
    * (d asc, code asc) tie-break is the struct field order, with a
    * NULL d (null sv slice) sorting first like the heap's
    * NULLS-FIRST ascending order. The codebook is the bounded model
    * table (m·ksub·(dim/m) doubles), driver-resident by design — the
    * same budget [[pqIntTrain]] and the ADC distance tables already
    * spend. Returns (id, j, sv, code). */
  private def assignLit(sv: DataFrame, m: Int,
    cb: Array[(Int, Int, Array[Double])]): DataFrame = {
    val byJ = (0 until m).map(j => cb.filter(_._1 == j).sortBy(_._2))
    require(byJ.forall(_.nonEmpty),
      s"assignLit needs >= 1 surviving code per subspace, got " +
        byJ.map(_.length).mkString(","))
    val cents = typedLit(byJ.map(_.map(_._3.toSeq).toSeq))
    val codes = typedLit(byJ.map(_.map(_._2).toSeq))
    val cn2s = typedLit(byJ.map(_.map(e => dotDD(e._3, e._3)).toSeq))
    sv.withColumn("__cc", element_at(cents, col("j") + 1))
      .withColumn("__cd", element_at(codes, col("j") + 1))
      .withColumn("__c2", element_at(cn2s, col("j") + 1))
      .withColumn("__a", array_min(expr(
        "transform(sequence(0, size(__cd) - 1), i -> named_struct(" +
          "'d', round((graft_dot(sv, sv) - 2.0D * graft_dot(sv, __cc[i]))" +
          " + __c2[i], 6), " +
          "'code', __cd[i]))")))
      .select(col("id"), col("j"), col("sv"), col("__a.code").as("code"))
  }

  /** Train the m per-subspace codebooks: (j, code, cent array<double>).
    * Each subspace seeds from its own `ksub` DISTINCT subvector
    * patterns — the patterns whose smallest carrying id hash-scatters
    * first. Per-subspace distinctness matters: seeding every subspace
    * from the same ksub corpus rows plants duplicate centroids wherever
    * those rows coincide in a subspace, the argmin tie-break starves
    * the duplicates and the cells die. `iters` Lloyd rounds run on the
    * sampled subvector table, all subspaces in one job per round. */
  def pqCodebooks(emb: DataFrame, idCol: String, vecCol: String,
    dim: Int, m: Int, ksub: Int, iters: Int, trainOneIn: Int = 1): DataFrame = {
    require(dim > 0 && m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub > 0 && iters >= 0 && trainOneIn >= 1,
      "need ksub > 0, iters >= 0, trainOneIn >= 1")
    GraftFunctions.register(emb.sparkSession)
    val sub = dim / m
    val svAll = subvectors(emb, idCol, vecCol, dim, m)
    val base = (if (trainOneIn == 1) svAll
      else svAll.filter(idHash(col("id")) % trainOneIn === 0))
      .localCheckpoint(true)
    // per-subspace seeds: collapse to distinct (j, sv) patterns keyed
    // by their smallest carrying id, then one bounded heap per subspace
    // picks the ksub patterns whose key id hash-scatters first
    val seedCb = graft.plans.GraftOps.topKPerGroup(
      base.groupBy(col("j"), col("sv")).agg(min(col("id")).as("__kid"))
        .withColumn("__h", idHash(col("__kid"))),
      Seq(col("j")), Seq(col("__h").asc, col("__kid").asc), ksub,
      rankName = "__rk")
      .select(col("j"), (col("__rk") - 1).cast("int").as("code"),
        expr("transform(sv, x -> CAST(x AS DOUBLE))").as("cent"))
    if (iters == 0) return seedCb
    // r15: the per-round codebook is the bounded MODEL table
    // (m·ksub·(dim/m) doubles) — it lives on the driver between rounds,
    // exactly like [[pqIntTrain]]'s integer kernel. Each round is then
    // ONE distributed job — the [[assignLit]] map feeding the exact
    // decimal-mean centroid aggregation, collected for the next
    // round's literals — instead of the broadcast build + bounded-heap
    // shuffle + (id, j) join-back + eager checkpoint the DataFrame
    // round paid (r13/r14 shape; shared:ivfpq_train / pq_prod_train
    // job counts measured down). Same distances (l2sq's tree, the
    // self-dot precomputed by the same left fold), same tie-break,
    // same centroid arithmetic — collected rows re-sort by (j, code)
    // so literal layout never depends on partition order [D1]; a code
    // emptied by a round disappears exactly as the groupBy dropped it.
    var cbLocal: Array[(Int, Int, Array[Double])] = seedCb.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val centroid = udaf(new CentroidAggregator(sub),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    var cbDf: DataFrame = null
    var it = 0
    while (it < iters) {
      cbDf = assignLit(base, m, cbLocal)
        .groupBy("j", "code")
        .agg(centroid(col("sv").cast("array<float>")).as("cent"))
      if (it < iters - 1)
        cbLocal = cbDf.collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      it += 1
    }
    cbDf
  }

  /** Encode the corpus: (id, j, code) — m rows per vector, the
    * compressed representation ADC searches against. The codebook is
    * the bounded model table: it collects to the driver once and the
    * encode is the [[assignLit]] pure map — at any corpus size the
    * encode stage has NO shuffle and no broadcast build (the former
    * bounded-heap form shuffled ≤ k·partitions rows and paid a
    * broadcast + heap exchange per encode). */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
    dim: Int, m: Int, cb: DataFrame): DataFrame =
    assignLit(subvectors(emb, idCol, vecCol, dim, m), m,
      cb.collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray)))
      .select("id", "j", "code")

  /** ADC top-k: per probe, rank ids by the sum of table-looked-up
    * sub-distances (asc, id tie-break). `probes` needs (probe_id, pe).
    * Returns (probe_id, vec_id, adc6, rank). The probe distance table
    * (|probes|·m·ksub rows) broadcasts; the codes never move.
    *
    * `excludeSelf` (default true) drops candidates whose id equals the
    * probe's id — the self-match exclusion for probes drawn FROM the
    * corpus, which therefore assumes probe_id shares the corpus id
    * space. External probe sets whose probe ids numerically collide
    * with corpus vec_ids must pass `excludeSelf = false`, or a
    * legitimate neighbor is silently dropped. */
  def pqAdcTopK(codes: DataFrame, cb: DataFrame, probes: DataFrame,
    dim: Int, m: Int, k: Int, excludeSelf: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    GraftFunctions.register(codes.sparkSession)
    val ptab = subvectors(probes, "probe_id", "pe", dim, m)
      .withColumnRenamed("id", "probe_id")
      .join(broadcast(cb), Seq("j"))
      .select(col("probe_id"), col("j"), col("code"),
        l2sq("sv", "cent").as("d"))
    val joined = codes.join(broadcast(ptab), Seq("j", "code"))
    val scores = (if (excludeSelf) joined.filter(col("id") =!= col("probe_id"))
      else joined)
      .groupBy("probe_id", "id")
      .agg(round(sum(col("d").cast(graft.Dets.Dec)).cast("double"), 6)
        .as("adc6"))
    graft.plans.GraftOps.topKPerGroup(scores, Seq(col("probe_id")),
        Seq(col("adc6").asc, col("id").asc), k, rankName = "rank")
      .select(col("probe_id"), col("id").as("vec_id"), col("adc6"),
        col("rank"))
      .orderBy("probe_id", "rank")
  }

  /** Two-stage PQ search — ADC shortlist of `shortK` candidates, then
    * EXACT squared-L2 re-rank of just those to top `k` (the standard
    * refine step: PQ's coarse ordering is strong but its fine ordering
    * quantizes away near-ties, so production PQ search re-scores a
    * small shortlist against the raw vectors — |probes|·shortK rows,
    * never the corpus). `emb` is the raw table the codes were built
    * from. Returns (probe_id, vec_id, l2sq6, rank). `excludeSelf` as in
    * [[pqAdcTopK]]: probes are assumed to share the corpus id space. */
  def pqSearch(codes: DataFrame, cb: DataFrame, emb: DataFrame,
    idCol: String, vecCol: String, probes: DataFrame,
    dim: Int, m: Int, shortK: Int, k: Int,
    excludeSelf: Boolean = true): DataFrame = {
    require(k > 0 && shortK >= k, "need shortK >= k > 0")
    rerank(pqAdcTopK(codes, cb, probes, dim, m, shortK, excludeSelf)
      .select("probe_id", "vec_id"), emb, idCol, vecCol, probes, k)
  }

  /** Exact squared-L2 re-rank of a (probe_id, vec_id) shortlist against
    * the raw vectors — |shortlist| rows joined, never the corpus. */
  private def rerank(short: DataFrame, emb: DataFrame, idCol: String,
    vecCol: String, probes: DataFrame, k: Int): DataFrame = {
    val cand = short
      .join(emb.select(col(idCol).as("vec_id"), col(vecCol).as("__cv")),
        Seq("vec_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .withColumn("l2sq6", round(
        call_function("graft_dot", col("__cv"), col("__cv"))
          - lit(2d) * call_function("graft_dot", col("pe"), col("__cv"))
          + call_function("graft_dot", col("pe"), col("pe")), 6))
      .select("probe_id", "vec_id", "l2sq6")
    graft.plans.GraftOps.topKPerGroup(cand, Seq(col("probe_id")),
        Seq(col("l2sq6").asc, col("vec_id").asc), k, rankName = "rank")
      .select("probe_id", "vec_id", "l2sq6", "rank")
      .orderBy("probe_id", "rank")
  }

  /** Deterministic OPQ-style rotation matrix: seeded Gaussian rows
    * (the q102 splitmix64 kernel) orthonormalized by modified
    * Gram-Schmidt — a pure driver-side function of (dim, seed), dim×dim
    * doubles (the quantizer's parameter, not data). Rotating vectors
    * before the subvector split spreads correlated energy across
    * subspaces so the same code budget quantizes finer — the
    * fixed-rotation member of the OPQ family (OPQ proper alternates
    * R-updates with codebook training; the fixed seeded R captures most
    * of the decorrelation win without a second training loop).
    * Rotation preserves L2, so ADC distances in rotated space ARE
    * distances in the original space and the exact re-rank stage can
    * use the raw vectors unchanged. */
  def rotationMatrix(dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    require(dim > 0, "dim must be positive")
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val g = graft.api.VectorOps.gaussianPlanes(dim, dim, seed)
      .map(_.map(_.toDouble))
    val q = Array.ofDim[Double](dim, dim)
    var r = 0
    var row = 0
    while (row < dim && r < dim) {
      val v = g(row).clone()
      var j = 0
      while (j < r) {
        val d = dot(q(j), v)
        var i = 0
        while (i < dim) { v(i) -= d * q(j)(i); i += 1 }
        j += 1
      }
      val n = math.sqrt(dot(v, v))
      // Gaussian rows are a.s. linearly independent; a (numerically)
      // dependent row is skipped rather than normalized into noise
      if (n > 1e-9) { q(r) = v.map(_ / n); r += 1 }
      row += 1
    }
    require(r == dim, s"rotation basis incomplete: $r of $dim")
    q
  }

  /** x → R·x as a codegen column: element i = graft_dot(R_i, x),
    * 6dp-rounded so every engine and partition layout trains and
    * encodes on identical rotated values [D2]. */
  def rotateCol(vecCol: String, rot: Array[Array[Double]]): Column =
    array(rot.map(r =>
      round(call_function("graft_dot", typedLit(r), col(vecCol)), 6)): _*)

  /** Two-stage PQ search with a fixed OPQ-style rotation: codebooks
    * train and codes encode on R·x; the ADC shortlist runs in rotated
    * space; the exact re-rank uses the RAW vectors (valid because R is
    * orthonormal — see [[rotationMatrix]]). Same code budget as
    * [[pqSearch]], finer quantization on correlated subspaces. */
  def opqSearch(emb: DataFrame, idCol: String, vecCol: String,
    probes: DataFrame, dim: Int, m: Int, ksub: Int, iters: Int,
    shortK: Int, k: Int, seed: Long = 7L, trainOneIn: Int = 1): DataFrame = {
    require(k > 0 && shortK >= k, "need shortK >= k > 0")
    GraftFunctions.register(emb.sparkSession)
    val rot = rotationMatrix(dim, seed)
    val rEmb = emb.select(col(idCol).as("id"),
      rotateCol(vecCol, rot).as("rv"))
    val cb = pqCodebooks(rEmb, "id", "rv", dim, m, ksub, iters, trainOneIn)
    val codes = pqEncode(rEmb, "id", "rv", dim, m, cb)
    val rProbes = probes.select(col("probe_id"),
      rotateCol("pe", rot).as("pe"))
    rerank(pqAdcTopK(codes, cb, rProbes, dim, m, shortK)
      .select("probe_id", "vec_id"), emb, idCol, vecCol, probes, k)
  }

  /** Variance-balancing dimension permutation — OPQ's eigenvalue-
    * allocation idea applied to the coordinate axes: order dimensions
    * by corpus variance (exact decimal moments [D2], pos tie-break)
    * and serpentine-deal them across the `m` subspaces so every
    * subspace carries a comparable energy budget — the failure mode it
    * fixes is a contiguous split putting all high-variance dims in one
    * subspace whose 256-code budget then dominates quantization error.
    * A permutation IS orthonormal, so L2 is preserved and the exact
    * re-rank stays on raw vectors. Returns perm with perm(k) = source
    * dim of output position k (positions j·sub .. j·sub+sub−1 belong
    * to subspace j); driver-side cost is one dim-bounded collect. */
  def variancePermutation(emb: DataFrame, vecCol: String,
    dim: Int, m: Int): Array[Int] = {
    require(dim > 0 && m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val st = emb.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(graft.Dets.Dec)).as("sx"),
        sum((col("x") * col("x")).cast(graft.Dets.Dec)).as("sxx"))
      .select(col("pos"),
        (col("sxx").cast("double") / col("n")
          - (col("sx").cast("double") / col("n"))
          * (col("sx").cast("double") / col("n"))).as("v"))
      .collect()
    val varByPos = st.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val order = (0 until dim).sortBy(p => (-varByPos.getOrElse(p, 0d), p))
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer[Int]())
    order.zipWithIndex.foreach { case (p, i) =>
      val j = if ((i / m) % 2 == 0) i % m else m - 1 - (i % m)
      buckets(j) += p
      ()
    }
    buckets.flatMap(_.sorted)
  }

  private def permuteCol(vecCol: String, perm: Array[Int]): Column =
    array(perm.map(p => col(vecCol).getItem(p)): _*)

  /** [[opqSearch]]'s permutation sibling: same two-stage search with
    * the [[variancePermutation]] instead of a dense rotation — cheaper
    * to apply (a projection, not dim² dots) and the better fit when
    * the coordinate axes are already meaningful and only their
    * GROUPING into subspaces is unbalanced. */
  def opqSearchPermuted(emb: DataFrame, idCol: String, vecCol: String,
    probes: DataFrame, dim: Int, m: Int, ksub: Int, iters: Int,
    shortK: Int, k: Int, trainOneIn: Int = 1): DataFrame = {
    require(k > 0 && shortK >= k, "need shortK >= k > 0")
    GraftFunctions.register(emb.sparkSession)
    val perm = variancePermutation(emb, vecCol, dim, m)
    val rEmb = emb.select(col(idCol).as("id"),
      permuteCol(vecCol, perm).as("rv"))
    val cb = pqCodebooks(rEmb, "id", "rv", dim, m, ksub, iters, trainOneIn)
    val codes = pqEncode(rEmb, "id", "rv", dim, m, cb)
    val rProbes = probes.select(col("probe_id"),
      permuteCol("pe", perm).as("pe"))
    rerank(pqAdcTopK(codes, cb, rProbes, dim, m, shortK)
      .select("probe_id", "vec_id"), emb, idCol, vecCol, probes, k)
  }

  /** Jacobi eigendecomposition of a small symmetric matrix (the
    * rotation update's 64×64 — driver-side, deterministic: fixed sweep
    * order, fixed tolerance). Returns (eigenvalues, eigenvector
    * COLUMNS as rows of the second array transposed convention:
    * v(i)(k) = component i of eigenvector k). */
  private def symEig(a0: Array[Array[Double]])
  : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, k) => if (i == k) 1d else 0d)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-22) {
      off = 0d
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-13) {
            val theta = (a(q)(q) - a(p)(p)) / (2d * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1d)) match {
                case 0d => 1d / (theta + math.sqrt(theta * theta + 1d))
                case x => x
              }
            val c = 1d / math.sqrt(t * t + 1d)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Procrustes solution R = argmax tr(R·M) over orthonormal R, via
    * SVD(M) = U·S·Vᵀ → R = V·Uᵀ (the OPQ-NP rotation update).
    * Singular triplets come from the Jacobi eigendecomposition of
    * MᵀM; a rank-deficient M (σ ≈ 0) keeps the caller's previous R
    * rather than emitting a junk basis. */
  private def procrustes(mm: Array[Array[Double]])
  : Option[Array[Array[Double]]] = {
    val n = mm.length
    val mtm = Array.tabulate(n, n) { (i, k) =>
      var s = 0d; var r = 0; while (r < n) { s += mm(r)(i) * mm(r)(k); r += 1 }
      s
    }
    val (ev, vm) = symEig(mtm)
    val sigma = ev.map(x => math.sqrt(math.max(x, 0d)))
    if (sigma.exists(_ < 1e-9)) return None
    // U columns: M·v_k / σ_k
    val u = Array.ofDim[Double](n, n)
    var k = 0
    while (k < n) {
      var i = 0
      while (i < n) {
        var s = 0d; var r = 0
        while (r < n) { s += mm(i)(r) * vm(r)(k); r += 1 }
        u(i)(k) = s / sigma(k)
        i += 1
      }
      k += 1
    }
    // R = V·Uᵀ (rows of R applied as x' = R·x)
    Some(Array.tabulate(n, n) { (i, kk) =>
      var s = 0d; var r = 0
      while (r < n) { s += vm(i)(r) * u(kk)(r); r += 1 }
      s
    })
  }

  /** Learned OPQ rotation (OPQ-NP, Ge et al. — public method): alternate
    * codebook training in the rotated space with the procrustes
    * R-update that maximizes agreement between the rotated data and
    * its quantized reconstruction. Seeded from the IDENTITY rotation,
    * so alternation 1's codebooks ARE flat PQ's and every subsequent
    * update can only reduce quantization error — on isotropic data the
    * learned R stays near identity (measured here: random rotations
    * LOSE ~0.1-0.17 top-3 overlap on this fixture, the learned R does
    * not), on correlated data it recovers the full OPQ win.
    *
    * Distributed shape per alternation: one codebook training
    * (pqCodebooks), one encode, and ONE 256-group aggregation of
    * per-(subspace, code) raw-x centroids — the update matrix
    * M = Σᵢ xᵢ·ŷᵢᵀ folds to Σ_{j,c} (nₗ·x̄ₗ)·centₗᵀ over the code
    * groups, so the driver sees m·ksub rows, never data. Returns
    * (R, codebooks, codes) for [[opqSearchWith]]. */
  def opqTrain(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
    m: Int, ksub: Int, iters: Int, alternations: Int, trainOneIn: Int = 1)
  : (Option[Array[Array[Double]]], DataFrame, DataFrame) = {
    require(alternations >= 1, "need alternations >= 1")
    GraftFunctions.register(emb.sparkSession)
    val sub = dim / m
    var rot: Option[Array[Array[Double]]] = None // None = identity
    def rotated: DataFrame = rot match {
      case Some(r) => emb.select(col(idCol).as("id"),
        rotateCol(vecCol, r).as("rv"))
      // identity trains on the raw floats — NOT the rotated path's 6dp
      // quantization — so alternation 1 is bit-identical to flat PQ
      // (measured: rounding here alone cost 0.833 → 0.800 overlap)
      case None => emb.select(col(idCol).as("id"), col(vecCol).as("rv"))
    }
    var cb: DataFrame = null
    var codes: DataFrame = null
    val centroid = udaf(new CentroidAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    var a = 0
    while (a < alternations) {
      val rEmb = rotated.localCheckpoint(true)
      cb = pqCodebooks(rEmb, "id", "rv", dim, m, ksub, iters, trainOneIn)
      codes = pqEncode(rEmb, "id", "rv", dim, m, cb)
      if (a < alternations - 1) {
        // M = Σ_{j,c} (n·x̄)·centᵀ — x̄ is the RAW-space mean of the
        // group (4dp decimal mean via the aggregator: deterministic,
        // and ample precision for a rotation update)
        val xm = codes
          .join(emb.select(col(idCol).as("id"), col(vecCol).as("__x")),
            Seq("id"))
          .groupBy("j", "code")
          .agg(centroid(col("__x").cast("array<float>")).as("xmean"),
            count(lit(1)).as("n"))
          .collect()
        val cbRows = cb.collect().map(r => (r.getInt(0), r.getInt(1)) ->
          r.getSeq[Double](2).toArray).toMap
        val mm = Array.ofDim[Double](dim, dim)
        xm.foreach { r =>
          val j = r.getInt(0); val code = r.getInt(1)
          val mean = r.getSeq[Double](2).toArray
          val n = r.getLong(3).toDouble
          cbRows.get((j, code)).foreach { cent =>
            var t = 0
            while (t < sub) {
              val q = j * sub + t
              val y = cent(t)
              var p = 0
              while (p < dim) { mm(p)(q) += n * mean(p) * y; p += 1 }
              t += 1
            }
          }
        }
        procrustes(mm).foreach(r => rot = Some(r))
      }
      a += 1
    }
    (rot, cb, codes)
  }

  /** Total squared quantization error Σᵢ‖R·xᵢ − q(R·xᵢ)‖² of a trained
    * (rotation, codebook, codes) triple — the objective OPQ minimizes;
    * the audit metric that shows what a learned rotation buys at a
    * fixed code budget. One pass: subvector table ⋈ codes ⋈ broadcast
    * codebooks, 6dp sub-distances decimal-summed [D2]. */
  def quantizationError(rot: Option[Array[Array[Double]]], cb: DataFrame,
    codes: DataFrame, emb: DataFrame, idCol: String, vecCol: String,
    dim: Int, m: Int): Double = {
    GraftFunctions.register(emb.sparkSession)
    val rEmb = rot match {
      case Some(r) => emb.select(col(idCol).as("id"),
        rotateCol(vecCol, r).as("rv"))
      case None => emb.select(col(idCol).as("id"), col(vecCol).as("rv"))
    }
    subvectors(rEmb, "id", "rv", dim, m)
      .join(codes, Seq("id", "j"))
      .join(broadcast(cb), Seq("j", "code"))
      .agg(sum(l2sq("sv", "cent").cast(graft.Dets.Dec)).as("e"))
      .head().getDecimal(0).doubleValue()
  }

  /** Two-stage search against [[opqTrain]] artifacts: ADC shortlist in
    * the learned-rotation space (`rot = None` ⇒ identity: probes pass
    * through raw, matching the raw-float identity training), exact
    * re-rank on raw vectors. */
  def opqSearchWith(rot: Option[Array[Array[Double]]], cb: DataFrame,
    codes: DataFrame, emb: DataFrame, idCol: String, vecCol: String,
    probes: DataFrame, dim: Int, m: Int, shortK: Int, k: Int): DataFrame = {
    require(k > 0 && shortK >= k, "need shortK >= k > 0")
    GraftFunctions.register(emb.sparkSession)
    val rProbes = rot match {
      case Some(r) => probes.select(col("probe_id"),
        rotateCol("pe", r).as("pe"))
      case None => probes.select("probe_id", "pe")
    }
    rerank(pqAdcTopK(codes, cb, rProbes, dim, m, shortK)
      .select("probe_id", "vec_id"), emb, idCol, vecCol, probes, k)
  }

  /** Decimal-mean cell centroids over an (id, cell) assignment:
    * (cell, cent array<double>). One of the three persisted IVF+PQ
    * training artifacts (with the residual codebooks and the codes) —
    * gated hosts memoize each via `Caches.memo` so repeated searches in
    * one session never retrain (the IvfIndex persisted-index analog). */
  def cellCentroids(emb: DataFrame, idCol: String, vecCol: String,
    dim: Int, cells: DataFrame): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val centroid = udaf(new CentroidAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(cells, Seq("id"))
      .groupBy("cell")
      .agg(centroid(col("v").cast("array<float>")).as("cent"))
  }

  /** Residual corpus (id, cell, res): v − centroid(cell) — what the
    * IVF+PQ codebooks train on and the codes encode. */
  def residuals(emb: DataFrame, idCol: String, vecCol: String,
    cells: DataFrame, cents: DataFrame): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(cells, Seq("id"))
      .join(broadcast(cents), Seq("cell"))
      .select(col("id"), col("cell"),
        expr("zip_with(v, cent, (x, y) -> CAST(x AS DOUBLE) - y)").as("res"))

  /** [[cellCentroids]] over an assignment that already CARRIES the
    * vector ((id, v, cell) — IvfIndex.kmeansAssigned): the same
    * decimal-mean aggregation with the corpus⋈cells id-join dropped
    * (guide §2.4 — the join re-attached a column the assignment map
    * had in hand). */
  def cellCentroidsAssigned(assigned: DataFrame, dim: Int): DataFrame = {
    GraftFunctions.register(assigned.sparkSession)
    val centroid = udaf(new CentroidAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    assigned.groupBy("cell")
      .agg(centroid(col("v").cast("array<float>")).as("cent"))
  }

  /** [[residuals]] over a vector-carrying assignment — one broadcast
    * of the |cells| centroids into a pure map, no corpus shuffle. */
  def residualsAssigned(assigned: DataFrame, cents: DataFrame): DataFrame =
    assigned.join(broadcast(cents), Seq("cell"))
      .select(col("id"), col("cell"),
        expr("zip_with(v, cent, (x, y) -> CAST(x AS DOUBLE) - y)").as("res"))

  /** IVF+PQ (residual) two-stage search — the composed 100 TB ANN
    * layout: a coarse quantizer of `kCells` learned cells prunes WHICH
    * ids are scored (only codes in the probe's `nprobe` nearest cells
    * participate), and PQ codes the RESIDUAL (vector − cell centroid),
    * which is tighter-distributed than raw vectors so the same code
    * budget quantizes finer. ADC runs per (probe, cell) with the
    * probe's residual against that cell, shortlists `shortK`, and the
    * exact re-rank finishes to top `k`.
    *
    * Scale shape: training (cells + codebooks) is sample-able
    * (`trainOneIn` — the spread-hash 1-in-n sample drives BOTH the
    * coarse Lloyd and the PQ codebook Lloyd; encoding and search always
    * cover the full corpus) and one-off; at query time the probe side
    * broadcasts a |probes|·nprobe·m·ksub distance table and the
    * (cell, j, code) equi-join touches only the probed cells' codes —
    * the corpus's raw vectors surface exclusively in the
    * |probes|·shortK re-rank join. Everything deterministic [D2]:
    * decimal-mean centroids, 6dp-rounded distances, (cell, code, id)
    * tie-breaks. Sessions answering many probe batches should train
    * once via [[cellCentroids]]/[[residuals]]/[[pqCodebooks]]/
    * [[pqEncode]] and search with [[ivfPqSearchWith]]. */
  def ivfPqSearch(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
    kCells: Int, cellIters: Int, m: Int, ksub: Int, pqIters: Int,
    probes: DataFrame, nprobe: Int, shortK: Int, k: Int,
    trainOneIn: Int = 1): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val cells = graft.sources.IvfIndex.kmeansCells(
      emb, idCol, vecCol, kCells, cellIters, dim, trainOneIn)
    val cents = cellCentroids(emb, idCol, vecCol, dim, cells)
      .localCheckpoint(true)
    val res = residuals(emb, idCol, vecCol, cells, cents)
      .localCheckpoint(true)
    val cb = pqCodebooks(res, "id", "res", dim, m, ksub, pqIters, trainOneIn)
    val codes = pqEncode(res, "id", "res", dim, m, cb)
      .join(res.select("id", "cell"), Seq("id"))
    ivfPqSearchWith(cents, cb, codes, emb, idCol, vecCol, dim, m,
      probes, nprobe, shortK, k)
  }

  /** [[ivfPqSearch]]'s query stage against prebuilt training artifacts:
    * `cents` (cell, cent), `cb` residual codebooks, `codes`
    * (id, j, code, cell). Self-match exclusion as in [[pqAdcTopK]]:
    * probes share the corpus id space, or pass `excludeSelf = false`. */
  def ivfPqSearchWith(cents: DataFrame, cb: DataFrame, codes: DataFrame,
    emb: DataFrame, idCol: String, vecCol: String, dim: Int, m: Int,
    probes: DataFrame, nprobe: Int, shortK: Int, k: Int,
    excludeSelf: Boolean = true): DataFrame = {
    require(nprobe > 0 && k > 0 && shortK >= k,
      "need nprobe > 0 and shortK >= k > 0")
    GraftFunctions.register(emb.sparkSession)
    // probe cell selection by exact L2 to the centroids
    val psel = graft.plans.GraftOps.topKPerGroup(
      broadcast(probes).crossJoin(broadcast(cents))
        .withColumn("d2", round(
          call_function("graft_dot", col("pe"), col("pe"))
            - lit(2d) * call_function("graft_dot", col("pe"), col("cent"))
            + call_function("graft_dot", col("cent"), col("cent")), 6))
        .select(col("probe_id"), col("pe"), col("cell"), col("d2")),
      Seq(col("probe_id")), Seq(col("d2").asc, col("cell").asc), nprobe,
      rankName = "__cr")
    // per-(probe, cell) residual → ADC distance table, broadcast
    val ptab = subvectorsKeyed(
      psel.join(broadcast(cents), Seq("cell"))
        .select(col("probe_id"), col("cell"),
          expr("zip_with(pe, cent, (x, y) -> CAST(x AS DOUBLE) - y)")
            .as("pres")),
      Seq("probe_id", "cell"), "pres", dim, m)
      .join(broadcast(cb), Seq("j"))
      .select(col("probe_id"), col("cell"), col("j"), col("code"),
        l2sq("sv", "cent").as("d"))
    val joined = codes.join(broadcast(ptab), Seq("cell", "j", "code"))
    val scores = (if (excludeSelf) joined.filter(col("id") =!= col("probe_id"))
      else joined)
      .groupBy("probe_id", "id")
      .agg(round(sum(col("d").cast(graft.Dets.Dec)).cast("double"), 6)
        .as("adc6"))
    val short = graft.plans.GraftOps.topKPerGroup(scores,
        Seq(col("probe_id")), Seq(col("adc6").asc, col("id").asc), shortK,
        rankName = "__r")
      .select(col("probe_id"), col("id").as("vec_id"))
    rerank(short, emb, idCol, vecCol, probes, k)
  }

  /** milli-quantize a float-vector column to int64 units — IEEE-exact
    * (`floor(double(x) · scale)`) in any engine, the [D5] staging step
    * shared by the integer trace path below and MlOps.kmeansTrace. */
  private def quantized(df: DataFrame, idCol: String, vecCol: String,
    idName: String, scale: Long): DataFrame =
    df.select(col(idCol).cast("long").as(idName),
        expr(s"transform($vecCol, x -> " +
          s"cast(floor(cast(x as double) * ${scale}L) as bigint))")
          .as("__e"))
      .filter(col("__e").isNotNull)

  /** the integer squared-L2 kernel between the subvector column `sv`
    * and a codebook column `cv` — pure int64 zip_with/aggregate, no
    * floats anywhere. */
  private val intL2 = expr("aggregate(zip_with(sv, cv, " +
    "(x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b)")

  /** Integer-exact PQ codebook training TRACE + final model — the
    * hash-gate trust anchor for the PQ family. [[pqCodebooks]] /
    * [[pqAdcTopK]] run the float production path (bounded by recall
    * floors in RecallAuditSpec); this replays the SAME per-subspace
    * Lloyd algorithm in 64-bit integer units so a SQL engine
    * reproduces every training round bit-exactly — the
    * MlOps.kmeansTrace [D5] conventions applied per subspace:
    *   - vectors milli-quantized ONCE (`floor(double(x)·scale)`),
    *     then split into `m` subvectors of `dim / m`; every distance,
    *     sum and centroid after that is int64;
    *   - seeds: the `ksub` rows with the smallest
    *     polyMix(pmod(id, M)) (ties by id) seed EVERY subspace,
    *     codes numbered in draw order — one portable draw, no RNG;
    *   - assignment ties break toward the lower code; the centroid
    *     update is the sign-explicit truncating per-dimension mean;
    *     an emptied code keeps its previous centroid.
    *
    * Returns (trace, cents, codes): `trace` = one row per
    * (round, j, code) with the member count and integer inertia of
    * that round's assignment (round r evaluated against the centroids
    * after r−1 updates); `cents` = the final (j, code, cv) integer
    * codebooks (the ones the last assignment used); `codes` = the
    * final (id, j, code) assignment.
    *
    * Scale shape (the kmeansTrace contract): per round ONE broadcast
    * of m·ksub centroid literals into a codegen'd zip_with kernel
    * over the subvector table — no join, ties broken inside
    * array_min — plus one (j, code, dim) partial agg folding to a
    * bounded m·ksub·(dim/m) driver-side update. With milli units the
    * per-row sub-distance stays ≤ (dim/m)·4e6·scale², so inertia
    * sums hold to ~1e9 rows per code before the inertia column would
    * need decimal staging. */
  def pqIntTrain(emb: DataFrame, idCol: String, vecCol: String,
    dim: Int, m: Int, ksub: Int, iters: Int, scale: Long = 1000L)
  : (DataFrame, DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(ksub >= 1 && iters >= 1, "need ksub >= 1 and iters >= 1")
    val spark = emb.sparkSession
    val sub = dim / m
    val hashM = TextFunctions.HashMod
    val sv = subvectorsKeyed(quantized(emb, idCol, vecCol, "id", scale),
      Seq("id"), "__e", dim, m).localCheckpoint(true)
    val seedIds = quantized(emb, idCol, vecCol, "id", scale)
      .select(col("id"),
        graft.operators.GraphQueries.polyMix(pmod(col("id"), lit(hashM)))
          .as("__h"))
      .orderBy(col("__h").asc, col("id").asc).limit(ksub)
      .collect().map(_.getLong(0))
    // with fewer usable rows than ksub the codebooks would be missing
    // (j, code) keys and the assign kernel would die later with an
    // opaque NoSuchElementException — fail at the draw, with the count
    require(seedIds.length == ksub,
      s"pqIntTrain needs >= ksub=$ksub rows with non-null embeddings " +
        s"to seed each subspace codebook; corpus yielded ${seedIds.length}")
    val seedRank = seedIds.zipWithIndex.toMap
    var cents: Map[(Int, Int), Array[Long]] =
      sv.filter(col("id").isin(seedIds.map(Long.box): _*)).collect()
        .map(r => (r.getInt(1), seedRank(r.getLong(0))) ->
          r.getSeq[Long](2).toArray).toMap
    // one codegen'd kernel: the full m×ksub codebook rides a SINGLE
    // nested array literal (one plan node), the row's subspace selects
    // its ksub centroids and a transform/array_min computes the argmin
    // (dist asc, code asc — the tie-break is the struct field order).
    // The earlier form built a per-(j, code) literal-array when-chain —
    // m·ksub separate aggregate/zip_with subtrees — whose analysis +
    // codegen dominated training wall-clock at the production geometry
    // (measured r14: shared:pqprodint_train 42 s at sf0.1 with 4.3 MiB
    // task binaries; 256 kernels of this shape). Same integer math,
    // same tie-break, O(1) plan size in (m, ksub).
    def assigned: DataFrame = {
      val cLit = typedLit((0 until m).map(j =>
        (0 until ksub).map(c => cents((j, c)).toSeq)))
      sv.withColumn("__cbs", element_at(cLit, col("j") + 1))
        .withColumn("__a", array_min(expr(
          s"transform(sequence(0, ${ksub - 1}), c -> named_struct(" +
            "'dist', aggregate(zip_with(sv, __cbs[c], " +
            "(x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b), " +
            "'code', CAST(c AS INT)))")))
        .select(col("id"), col("j"), col("sv"),
          col("__a.code").as("code"), col("__a.dist").as("dist"))
    }
    // ONE distributed job per round: the (j, code, pos)-keyed stats agg
    // yields the centroid-update sums AND the round's trace numbers
    // (n_vecs / inertia = the pos-0 slice — dist repeats per exploded
    // position, so summing it where pos = 0 is the plain per-(j, code)
    // sum). The earlier loop evaluated each round's assignment TWICE
    // (sums collect + the trace's union member) and the final one a
    // third time for codes, and the iters-member union of assignment
    // plans was re-analyzed whole at every trace action; the trace rows
    // are m·ksub·iters bounded, so they assemble driver-side like the
    // final centroids (measured r14 with the kernel fix compounding:
    // shared:pqprodint_train 42 s → 3.3 s at sf0.1).
    val traceRows = Seq.newBuilder[Row]
    var lastAssign: DataFrame = null
    var r = 1
    while (r <= iters) {
      val a = assigned
      lastAssign = a
      val stats = a.select(col("j"), col("code"), col("dist"),
          posexplode(col("sv")))
        .groupBy("j", "code", "pos")
        .agg(sum("col").as("s"), count(lit(1)).as("n"),
          sum("dist").as("sd"))
        .collect()
      traceRows ++= stats.iterator
        .filter(_.getInt(2) == 0)
        .map(row => Row(r.toLong, row.getInt(0), row.getInt(1),
          row.getLong(4), row.getLong(5)))
      if (r < iters) {
        val sums = stats
          .map(row => (row.getInt(0), row.getInt(1), row.getInt(2)) ->
            (row.getLong(3), row.getLong(4))).toMap
        cents = cents.map { case ((j, c), old) =>
          (j, c) -> Array.tabulate(sub) { d =>
            sums.get((j, c, d)) match {
              // sign-explicit truncation toward zero: SQL floor-division
              // conventions differ on negatives, this form does not
              case Some((g, n)) if n > 0 =>
                if (g < 0) -((-g) / n) else g / n
              case _ => old(d)
            }
          }
        }
      }
      r += 1
    }
    val traceSchema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("n_vecs", LongType, nullable = false),
      StructField("inertia", LongType, nullable = false)))
    val traceDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        traceRows.result().sortBy(row =>
          (row.getLong(0), row.getInt(1), row.getInt(2))), 1), traceSchema)
    val centSchema = StructType(Seq(
      StructField("j", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("cv", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val centDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        cents.toSeq.sortBy(_._1)
          .map { case ((j, c), v) => Row(j, c, v.toSeq) }, 1), centSchema)
    (traceDf.orderBy("round", "j", "code"),
      centDf,
      lastAssign.select(col("id"), col("j"), col("code")))
  }

  /** ADC ranking in EXACT integer units over [[pqIntTrain]]'s model:
    * probes are the corpus rows with id < `nProbes`, each ranked
    * against every OTHER vector by the summed per-subspace integer
    * sub-distance to the centroid of that vector's code — the
    * [[pqAdcTopK]] plan shape (the |probes|·m·ksub distance table
    * broadcasts into the codes, which never move; partial sums
    * collapse map-side; bounded-heap top-k) with the 6dp float table
    * replaced by the bit-replayable int64 one. */
  def pqIntAdcTopK(emb: DataFrame, idCol: String, vecCol: String,
    dim: Int, m: Int, cents: DataFrame, codes: DataFrame,
    nProbes: Int, k: Int, scale: Long = 1000L): DataFrame = {
    val psv = subvectorsKeyed(
      quantized(emb.filter(col(idCol) < nProbes), idCol, vecCol,
        "probe_id", scale),
      Seq("probe_id"), "__e", dim, m)
    val pd = psv.join(broadcast(cents), Seq("j"))
      .select(col("probe_id"), col("j"), col("code"), intL2.as("pd"))
    val adc = codes.join(broadcast(pd), Seq("j", "code"))
      .filter(col("id") =!= col("probe_id"))
      .groupBy("probe_id", "id")
      .agg(sum("pd").as("adc"))
    graft.plans.GraftOps.topKPerGroup(adc, Seq(col("probe_id")),
        Seq(col("adc").asc, col("id").asc), k)
      .select(col("probe_id"), col("id").as("vec_id"), col("adc"),
        col("rn"))
      .orderBy("probe_id", "rn")
  }
}
