package graft.api

import graft.functions.{CentroidAggregator, GraftFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** (id, j, sv) subvector table: vector split into `m` slices of
    * `dim / m` float components. */
  private def subvectors(emb: DataFrame, idCol: String, vecCol: String,
    dim: Int, m: Int): DataFrame = {
    val sub = dim / m
    emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), explode(expr(
        s"transform(sequence(0, ${m - 1}), j -> " +
          s"named_struct('j', CAST(j AS INT), 'sv', slice(v, j*$sub+1, $sub)))"))
        .as("x"))
      .select(col("id"), col("x.j").as("j"), col("x.sv").as("sv"))
  }

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
    var cb = graft.plans.GraftOps.topKPerGroup(
      base.groupBy(col("j"), col("sv")).agg(min(col("id")).as("__kid"))
        .withColumn("__h", idHash(col("__kid"))),
      Seq(col("j")), Seq(col("__h").asc, col("__kid").asc), ksub,
      rankName = "__rk")
      .select(col("j"), (col("__rk") - 1).cast("int").as("code"),
        expr("transform(sv, x -> CAST(x AS DOUBLE))").as("cent"))
      .localCheckpoint(true)
    val centroid = udaf(new CentroidAggregator(sub),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    var it = 0
    while (it < iters) {
      cb = assign(base, cb)
        .join(base, Seq("id", "j"))
        .groupBy("j", "code")
        .agg(centroid(col("sv").cast("array<float>")).as("cent"))
        .localCheckpoint(true)
      it += 1
    }
    cb
  }

  /** Encode the corpus: (id, j, code) — m rows per vector, the
    * compressed representation ADC searches against. */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
    dim: Int, m: Int, cb: DataFrame): DataFrame =
    assign(subvectors(emb, idCol, vecCol, dim, m), cb)

  /** ADC top-k: per probe, rank ids by the sum of table-looked-up
    * sub-distances (asc, id tie-break). `probes` needs (probe_id, pe).
    * Returns (probe_id, vec_id, adc6, rank). The probe distance table
    * (|probes|·m·ksub rows) broadcasts; the codes never move. */
  def pqAdcTopK(codes: DataFrame, cb: DataFrame, probes: DataFrame,
    dim: Int, m: Int, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    GraftFunctions.register(codes.sparkSession)
    val ptab = subvectors(probes, "probe_id", "pe", dim, m)
      .withColumnRenamed("id", "probe_id")
      .join(broadcast(cb), Seq("j"))
      .select(col("probe_id"), col("j"), col("code"),
        l2sq("sv", "cent").as("d"))
    val scores = codes.join(broadcast(ptab), Seq("j", "code"))
      .filter(col("id") =!= col("probe_id"))
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
    * from. Returns (probe_id, vec_id, l2sq6, rank). */
  def pqSearch(codes: DataFrame, cb: DataFrame, emb: DataFrame,
    idCol: String, vecCol: String, probes: DataFrame,
    dim: Int, m: Int, shortK: Int, k: Int): DataFrame = {
    require(k > 0 && shortK >= k, "need shortK >= k > 0")
    val short = pqAdcTopK(codes, cb, probes, dim, m, shortK)
      .select("probe_id", "vec_id")
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
}
