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
    rerank(pqAdcTopK(codes, cb, probes, dim, m, shortK)
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

  /** IVF+PQ (residual) two-stage search — the composed 100 TB ANN
    * layout: a coarse quantizer of `kCells` learned cells prunes WHICH
    * ids are scored (only codes in the probe's `nprobe` nearest cells
    * participate), and PQ codes the RESIDUAL (vector − cell centroid),
    * which is tighter-distributed than raw vectors so the same code
    * budget quantizes finer. ADC runs per (probe, cell) with the
    * probe's residual against that cell, shortlists `shortK`, and the
    * exact re-rank finishes to top `k`.
    *
    * Scale shape: training (cells + codebooks) is sample-able and
    * one-off; at query time the probe side broadcasts a
    * |probes|·nprobe·m·ksub distance table and the (cell, j, code)
    * equi-join touches only the probed cells' codes — the corpus's raw
    * vectors surface exclusively in the |probes|·shortK re-rank join.
    * Everything deterministic [D2]: decimal-mean centroids, 6dp-rounded
    * distances, (cell, code, id) tie-breaks. */
  def ivfPqSearch(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
    kCells: Int, cellIters: Int, m: Int, ksub: Int, pqIters: Int,
    probes: DataFrame, nprobe: Int, shortK: Int, k: Int): DataFrame = {
    require(nprobe > 0 && k > 0 && shortK >= k,
      "need nprobe > 0 and shortK >= k > 0")
    GraftFunctions.register(emb.sparkSession)
    val cells = graft.sources.IvfIndex.kmeansCells(
      emb, idCol, vecCol, kCells, cellIters, dim)
    val embIC = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(cells, Seq("id"))
    val centroid = udaf(new CentroidAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    val cents = embIC.groupBy("cell")
      .agg(centroid(col("v").cast("array<float>")).as("cent"))
      .localCheckpoint(true)
    // residual corpus: PQ trains and encodes on (v − centroid(cell))
    val res = embIC.join(broadcast(cents), Seq("cell"))
      .select(col("id"), col("cell"),
        expr("zip_with(v, cent, (x, y) -> CAST(x AS DOUBLE) - y)").as("res"))
      .localCheckpoint(true)
    val cb = pqCodebooks(res, "id", "res", dim, m, ksub, pqIters)
    val codes = pqEncode(res, "id", "res", dim, m, cb)
      .join(res.select("id", "cell"), Seq("id"))
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
    val scores = codes.join(broadcast(ptab), Seq("cell", "j", "code"))
      .filter(col("id") =!= col("probe_id"))
      .groupBy("probe_id", "id")
      .agg(round(sum(col("d").cast(graft.Dets.Dec)).cast("double"), 6)
        .as("adc6"))
    val short = graft.plans.GraftOps.topKPerGroup(scores,
        Seq(col("probe_id")), Seq(col("adc6").asc, col("id").asc), shortK,
        rankName = "__r")
      .select(col("probe_id"), col("id").as("vec_id"))
    rerank(short, emb, idCol, vecCol, probes, k)
  }
}
