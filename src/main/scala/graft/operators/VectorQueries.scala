package graft.operators

import graft.{Dets, Tables}
import graft.functions.{CentroidAggregator, GraftFunctions, TextFunctions}
import graft.functions.TextFunctions.Sql
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.10 vector operators: brute-force cosine top-k (q62), typed-UDAF
  * centroids (q63), embedding-cosine near-dup pairs (q69), and an
  * IVF-style two-stage ANN search (q70, oracle-omitted).
  *
  * Scale notes: cosines run through the codegen'd `graft_dot` expression
  * (FloatVecDot — a primitive loop inside whole-stage codegen, ~10× the
  * interpreted HOF fold) and squared norms are computed once per row
  * BEFORE the pair join, so each candidate pair costs one dot product,
  * not three. Probes are tiny and explicitly `broadcast()` — the corpus
  * never shuffles. q70 is the 100 TB path: rank coarse centroids first
  * (|cells| ≪ |corpus|), then scan only the nprobe=2 selected cells; with
  * the corpus bucketed by cell id that prunes ~80% of the scan.
  * Association order matches the oracle exactly: left-fold double dot,
  * cos = dot/(sqrt(n2a)*sqrt(n2b)), round 4dp, vec_id tie-break.
  */
object VectorQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.loadSpread(s, dir, n)

  /** The shared cosine-from-precomputed-norms formulation. */
  private def cosWith(a: String, b: String, n2a: String, n2b: String): Column =
    graft.api.VectorOps.cosWith(a, b, n2a, n2b)

  // 16 bands × 4 sign bits: at the q69/q102 operating point (cos 0.35,
  // θ ≈ 70°) a plane agrees with p ≈ 0.61, so deep bands almost never
  // collide — 8-bit bands measured 0.10 recall at sf0.1 — while 4-bit
  // bands at 16 tables measure 0.93 (RecallAuditSpec; 24 tables 0.98).
  // Shallow-band/many-table is the standard sign-LSH regime for
  // moderate-cosine thresholds; high-cosine near-dup (0.9+) would
  // invert the trade (deeper bands, fewer tables).
  private[graft] val LshPlanesPerBand = 4
  private[graft] val LshBands = 16

  /** q390's Johnson–Lindenstrauss geometry: 64 → JlDim random Gaussian
    * projections (its own seed, distinct from the LSH planes), pair
    * sample = (i, i + JlGap) id stride. Declared before the oracle map
    * interpolates. */
  private[graft] val JlDim = 16
  private[graft] val JlSeed = 43L
  private[graft] val JlGap = 101L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_sim_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.api.VectorOps.cosineTopK(emb, "vec_id", "embedding", probes, 5)
        .select(col("probe_id"), col("id").as("vec_id"),
          col("cos").as("cos4"), col("rn"))
        .orderBy("probe_id", "rn")
    }),

    // Hard-negative mining: each probe's 5 nearest corpus neighbours
    // with a DIFFERENT label — the confusable-but-wrong training
    // examples contrastive retrieval fine-tuning needs. Same one-scan
    // broadcast-probe contract as q62; the label exclusion rides the
    // join predicate, so excluded candidates never enter the heap.
    "q233_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("label").as("probe_label"),
          col("embedding").as("pe"))
      graft.api.VectorOps.hardNegatives(
          emb, "vec_id", "embedding", "label", probes, 5)
        .select(col("probe_id"), col("id").as("vec_id"),
          col("cos").as("cos4"), col("rn"))
        .orderBy("probe_id", "rn")
    }),

    // kNN majority-vote label propagation: predict each probe's label
    // from its 5 nearest labeled corpus neighbors (the weak-supervision /
    // label-transfer step of a training-data pipeline). Reuses the
    // broadcast-probe top-k kernel, then one tiny (probes × labels)
    // vote count and a bounded-heap argmax — the corpus is scanned once
    // and never shuffled.
    "q97_knn_label" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("label").as("true_label"))
      val nn = graft.api.VectorOps.cosineTopK(
        emb.filter(col("vec_id") >= 10), "vec_id", "embedding",
        probes.select("probe_id", "pe"), 5)
      val votes = nn
        .join(emb.select(col("vec_id").as("id"), col("label")), "id")
        .groupBy("probe_id", "label")
        .agg(count(lit(1)).as("votes"))
      graft.plans.GraftOps.topKPerGroup(votes, Seq(col("probe_id")),
        Seq(col("votes").desc, col("label").asc), 1, rankName = "rk")
        .join(probes.select("probe_id", "true_label"), "probe_id")
        .select(col("probe_id"), col("true_label"),
          col("label").as("pred_label"), col("votes"))
        .orderBy("probe_id")
    }),

    // The aggregator produces the centroid array; it is emitted exploded
    // to (label, dim, c) rows of scalar doubles — hash-safe across
    // engines and directly comparable to the oracle's per-dimension CTE.
    "q63_centroid_agg" -> ((s, dir) =>
      graft.api.VectorOps.centroids(
        t(s, dir, "embeddings"), "label", "embedding", 64)
        .select(col("group").as("label"), col("n"),
          posexplode(col("centroid")).as(Seq("pos", "c")))
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          col("c"), col("n"))
        .orderBy("label", "dim")),

    "q69_embed_neardup" -> ((s, dir) =>
      graft.api.VectorOps.cosinePairs(
        t(s, dir, "embeddings"), "vec_id", "embedding", 0.35)
        .select(col("id_lo"), col("id_hi"), col("cos").as("cos4"))
        .orderBy("id_lo", "id_hi")),

    // Per-vector kNN density within the label block — the SemDeDup
    // redundancy-pressure score (mean cosine to the 5 nearest same-
    // label neighbours; dense regions ⇒ duplicative). The label is the
    // blocking key here; at 100 TB the same API takes an IVF cell id or
    // LSH bucket column, so the pair scan stays Σ|block|², never
    // |corpus|². Rank = rounded cosine with id tie-break through the
    // bounded-heap top-k; the mean decimal-sums rounded cosines [D2].
    "q124_knn_density" -> ((s, dir) =>
      graft.api.VectorOps.knnDensity(t(s, dir, "embeddings"),
        "vec_id", "embedding", "label", DensityK)
        .select(col("id").as("vec_id"), col("label"), col("k_nn"),
          col("density4"))
        .orderBy("vec_id")),

    // Scalar int8-style quantization: per-dim corpus min/max (one
    // broadcast row) + a pure map emitting codes and reconstruction
    // error — the vector-compression ETL step. Codes emit comma-joined
    // (q27 pattern) so the driver's value hash sees a scalar.
    "q96_quantize" -> ((s, dir) =>
      graft.api.VectorOps.quantizeMinMax(
        t(s, dir, "embeddings"), "vec_id", "embedding", 64)
        .select(col("id").as("vec_id"),
          expr("array_join(transform(codes, x -> CAST(x AS STRING)), ',')")
            .as("codes_csv"),
          col("rmse4"))
        .orderBy("vec_id")),

    // Embedding-norm outlier detection: per label, mean/stddev of the
    // L2 norms from exact decimal moments (q43's partition-invariant
    // formulation) and the count of vectors beyond 2σ — the embedding
    // sanity screen (broken encoders produce degenerate norms). Norms
    // are 6dp-quantized BEFORE the moment sums so every engine and
    // partition layout folds identical decimals; one corpus pass for
    // the moments, one broadcast join back for the outlier count.
    "q101_embed_outliers" -> ((s, dir) => {
      GraftFunctions.register(s)
      val nrm = t(s, dir, "embeddings").select(col("label"),
        round(sqrt(expr("graft_dot(embedding, embedding)")), 6).as("x"))
      val stats = nrm.groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(Dets.Dec)).as("sx"),
          sum((col("x") * col("x")).cast(Dets.Dec)).as("sxx"))
        .withColumn("mean", col("sx").cast("double") / col("n"))
        .withColumn("sd", sqrt(greatest(lit(0d),
          col("sxx").cast("double") / col("n")
            - col("mean") * col("mean"))))
      nrm.join(broadcast(stats), "label")
        .groupBy("label")
        .agg(max("n").as("n"),
          round(max("mean"), 4).as("mean4"),
          round(max("sd"), 4).as("sd4"),
          sum(when(abs(col("x") - col("mean")) > lit(2d) * col("sd"), 1L)
            .otherwise(0L)).as("n_out"))
        .orderBy("label")
    }),

    // The 100 TB near-dup path declared as its own gated query: random-
    // hyperplane LSH bands replace q69's O(n²) pair scan with an
    // equi-join on (band, sign-pattern key); only candidates pay the
    // exact cosine verify. Deterministic end-to-end — splitmix64-seeded
    // Gaussian planes are pure functions of (seed, plane, dim) — so the
    // oracle embeds the same planes as literals and replays the banding
    // (the q66 MinHash-constant pattern).
    "q102_embed_lsh" -> ((s, dir) =>
      graft.api.VectorOps.cosineLshPairs(
        t(s, dir, "embeddings"), "vec_id", "embedding", 64, 0.35,
        LshPlanesPerBand, LshBands)
        .select(col("id_lo"), col("id_hi"), col("cos").as("cos4"))
        .orderBy("id_lo", "id_hi")),

    // Johnson–Lindenstrauss projection distortion audit (JL 1984,
    // public lemma; seeded Gaussian projection à la q102's planes) —
    // the measured answer to "can the ANN tier run at JlDim instead of
    // 64": project every vector once (JlDim codegen dot products, one
    // narrow map), pair up a deterministic id-stride sample, and
    // report how far the projected cosine drifts from the full-dim
    // truth. Gap terms quantize to 4dp then exact integer staging for
    // the mean [D5]; the projection replays in the oracle from the
    // SAME plane literals. Scale: linear project + a self-join on a
    // shifted key — never a pair blowup.
    "q390_jl_distortion" -> ((s, dir) => {
      GraftFunctions.register(s)
      val planes = graft.api.VectorOps.gaussianPlanes(JlDim, 64, JlSeed)
      val proj = array((0 until JlDim).map(j =>
        call_function("graft_dot", col("embedding"),
          typedLit(planes(j)))): _*)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), proj.as("y"))
      val a = e.select(col("vec_id").as("ida"),
        col("embedding").as("va"), col("y").as("ya"))
      val b = e.select(col("vec_id").as("idb"),
        col("embedding").as("vb"), col("y").as("yb"))
      val g = a.join(b, col("idb") === col("ida") + JlGap)
        .withColumn("c64", round(expr(TextFunctions.cosine("va", "vb")), 4))
        .withColumn("c16", round(expr(TextFunctions.cosine("ya", "yb")), 4))
        .withColumn("gap4", round(abs(col("c16") - col("c64")), 4))
      g.agg(count(lit(1)).as("n_pairs"),
          sum(round(col("gap4") * 10000).cast("long")).as("sg"),
          max(col("gap4")).as("max_gap4"))
        .select(col("n_pairs"),
          round(expr("sg div n_pairs").cast("double") / 1e4, 4)
            .as("mean_gap4"),
          col("max_gap4"))
    }),

    // SemDeDup-style semantic dedup keep-list: q102's LSH pair graph
    // resolved to connected components (the q77 star-contraction
    // machinery on the embedding modality), canonical keep = min id
    // per cluster. The pair build never goes quadratic and the
    // component solve is bounded by the edge cutover, so the whole
    // pipeline is the 100 TB shape end-to-end.
    "q110_semdedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = graft.api.VectorOps.cosineLshPairs(
        emb, "vec_id", "embedding", 64, 0.35,
        LshPlanesPerBand, LshBands).select("id_lo", "id_hi")
      graft.api.DedupOps.clusterResolve(emb, "vec_id", pairs)
        .orderBy("vec_id")
    }),

    // Two-stage ANN (coarse quantizer over label centroids, then fine
    // search in the top-2 cells). The whole pipeline is deterministic —
    // decimal-mean centroids [D2], 4dp-rounded cosines, id tie-breaks —
    // so the oracle replays it exactly in SQL (gated since round 3;
    // structure additionally asserted in OperatorSpec).
    "q70_ann_ivf" -> ((s, dir) => {
      GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
        .withColumn("n2", expr("graft_dot(embedding, embedding)"))
      // the library centroid op, not an inline re-implementation — one
      // aggregation recipe to keep in sync with the oracle
      val cents = graft.api.VectorOps.centroids(
          emb, "label", "embedding", 64)
        .select(col("group").as("cell"), col("centroid").as("cent"))
        .withColumn("cn2", expr("graft_dot(cent, cent)"))
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("n2").as("pn2"))
      val wCell = Window.partitionBy("probe_id")
        .orderBy(col("ccos").desc, col("cell").asc)
      val cells = broadcast(probes)
        .crossJoin(broadcast(cents))
        .withColumn("ccos", round(cosWith("pe", "cent", "pn2", "cn2"), 4))
        .withColumn("crk", row_number().over(wCell))
        .filter(col("crk") <= 2)
        .select(col("probe_id").as("c_probe_id"), col("pe"),
          col("pn2"), col("cell"))
      graft.plans.GraftOps.topKPerGroup(
        cells.join(emb, col("cell") === col("label") &&
            col("vec_id") =!= col("c_probe_id"))
          .select(col("c_probe_id").as("probe_id"), col("pe"), col("pn2"),
            col("vec_id"), col("embedding"), col("n2"))
          .withColumn("cos4", round(cosWith("pe", "embedding", "pn2", "n2"), 4))
          .select("probe_id", "vec_id", "cos4"),
        Seq(col("probe_id")),
        Seq(col("cos4").desc, col("vec_id").asc), 3)
        .select("probe_id", "vec_id", "cos4", "rn")
        .orderBy("probe_id", "rn")
    }),

    // Product-quantization two-stage search (PqOps): 16 subspaces × 16
    // codes trained with 4 Lloyd rounds, the corpus encoded to 16
    // small codes per vector (16× compression), probes ADC-shortlisted
    // by summed table-looked-up sub-distances and the shortlist
    // exact-re-ranked — the memory-resident 100 TB ANN path (only
    // |probes|·shortK raw vectors are ever touched at query time).
    // k-means is not SQL-expressible, so like q22/q45 this is
    // oracle-omitted; RecallAuditSpec pins the measured exact-L2
    // overlap floor and ApiSpec covers the ADC invariants.
    // Training artifacts (codebooks, codes) memoize via Caches.memo
    // keyed on (dir, layout) — a session answering many probe batches
    // trains once and pays only the search stage per invocation.
    "q132_pq_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (cb, codes) = pqProdArtifacts(s, dir)
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.api.PqOps.pqSearch(codes, cb, emb, "vec_id", "embedding",
        probes, 64, PqM, PqShortK, 3)
    }),

    // IVF+PQ residual composition (PqOps.ivfPqSearch): learned coarse
    // cells prune which codes are scored, PQ codes the residuals
    // (tighter-distributed than raw vectors at the same code budget),
    // ADC runs per probed cell, exact re-rank finishes. On this
    // fixture's weakly-clustered geometry the coarse quantizer is the
    // recall cap (cell recall ~0.77 at nprobe 4 — the q70/IvfIndex
    // finding), so the shipped operating point probes 6 of 8 cells:
    // measured 0.833, matching flat PQ, with the pruning machinery
    // fully exercised; clustered production data is where nprobe ≪
    // kCells pays. Oracle-omitted like q132 (k-means); floors in
    // RecallAuditSpec. The five training artifacts (coarse assignment,
    // cell centroids, residual corpus, codebooks, codes) memoize via
    // Caches.memo keyed on (dir, layout) — only the search stage runs
    // per invocation after the first.
    "q134_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (cents, cb, codes) = ivfPqArtifacts(s, dir)
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.api.PqOps.ivfPqSearchWith(cents, cb, codes, emb, "vec_id",
        "embedding", 64, PqM, probes, IvfPqNprobe, IvfPqShortK, 3)
    }),

    // Per-dimension corpus statistics of the embedding column — the
    // feature-scaling profile (mean/variance/min/max per dimension)
    // every normalization or whitening stage reads first. q63 is the
    // per-LABEL mean; this is the corpus-global second-moment sweep:
    // one posexplode → 64-group hash agg (map-side combinable), exact
    // decimal sums for both moments ([D2] — x and x·x quantize to 6dp
    // before summing), min/max exact picks emitted as double (the
    // float→double widening is value-preserving).
    // Embedding-space drift monitor — the vector-side sibling of
    // q283's vocabulary drift: the corpus splits into two seeded
    // halves (polyMix parity of vec_id, a pure function of the data
    // [D1]), each half's centroid comes from exact decimal per-dim
    // sums (q63 staging), and the report is centroid cosine, L2 shift,
    // and norm ratio — the numbers an embedding-pipeline dashboard
    // alerts on when a re-embed or corpus shift moves the space. Two
    // hash aggs + a 64-row dim join; per-dim products 12dp-quantized
    // and decimal-summed [D2]; final trees shared-string (DriftFormula).
    "q320_embedding_drift" -> ((s, dir) => {
      val hm = graft.operators.GraphQueries.HashM
      val flat = t(s, dir, "embeddings").select(
        pmod(graft.operators.GraphQueries.polyMix(
          pmod(col("vec_id"), lit(hm))), lit(2L)).as("h"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      val dims = flat.groupBy("h", "pos")
        .agg(count(lit(1)).as("n"), sum(col("x").cast(Dets.Dec)).as("sx"))
        .select(col("h"), col("pos"), col("n"),
          (col("sx").cast("double") / col("n")).as("c"))
      val a = dims.filter(col("h") === 0)
        .select(col("pos"), col("c").as("ca"), col("n").as("na"))
      val b = dims.filter(col("h") === 1)
        .select(col("pos"), col("c").as("cb"), col("n").as("nb"))
      a.join(b, Seq("pos"))
        .select(col("na"), col("nb"),
          round(col("ca") * col("cb"), 12).cast("decimal(38,12)")
            .as("dot"),
          round(col("ca") * col("ca"), 12).cast("decimal(38,12)")
            .as("aa"),
          round(col("cb") * col("cb"), 12).cast("decimal(38,12)")
            .as("bb"),
          round((col("ca") - col("cb")) * (col("ca") - col("cb")), 12)
            .cast("decimal(38,12)").as("dd"))
        .agg(max(col("na")).as("n0"), max(col("nb")).as("n1"),
          sum(col("dot")).as("sdot"), sum(col("aa")).as("saa"),
          sum(col("bb")).as("sbb"), sum(col("dd")).as("sdd"))
        .select(col("n0"), col("n1"),
          expr(DriftFormula.cos6).as("cos6"),
          expr(DriftFormula.l26).as("l2_6"),
          expr(DriftFormula.nr6).as("normratio6"))
    }),

    "q206_embed_dim_stats" -> ((s, dir) => {
      val flat = t(s, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .select((col("pos") + 1).cast("long").as("dim"), col("x"))
      flat.groupBy("dim")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(Dets.Dec)).cast("double").as("sx"),
          sum((col("x").cast("double") * col("x").cast("double"))
            .cast(Dets.Dec)).cast("double").as("sx2"),
          min(col("x")).cast("double").as("min_x"),
          max(col("x")).cast("double").as("max_x"))
        .select(col("dim"), col("n"),
          round(col("sx") / col("n"), 4).as("mean4"),
          round((col("sx2") - col("sx") * col("sx") / col("n"))
            / (col("n") - 1), 4).as("var4"),
          col("min_x"), col("max_x"))
        .orderBy("dim")
    }),

    // Nearest-centroid assignment + inertia — the k-means E-step as a
    // gated relational verb (the training loops in IvfIndex/PqOps use
    // the compiled kernel; this pins the SEMANTICS under the oracle).
    // Centroids are the q63 4dp-rounded per-(label, dim) means, the
    // squared distance accumulates 8dp-quantized per-dim terms (exact
    // decimal sum — partition-order-free), and the argmin breaks d6
    // ties by smallest label via the min-join (no engine-specific
    // arg_min tie rule). Plan shape: one flat explode feeds BOTH the
    // 512-row centroid build and the distance join; the centroid table
    // broadcasts.
    "q216_nearest_centroid" -> ((s, dir) => {
      val flat = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
      val cent = flat.groupBy(col("label").as("cl"), col("dim"))
        .agg(round(sum(col("x").cast(Dets.Dec)).cast("double")
          / count(lit(1)), 4).as("c4"))
      val dist = flat.drop("label").join(broadcast(cent), Seq("dim"))
        .withColumn("d", col("x").cast("double") - col("c4"))
        .select(col("vec_id"), col("cl"),
          (col("d") * col("d")).cast("decimal(38,8)").as("t8"))
        .groupBy("vec_id", "cl")
        .agg(round(sum(col("t8")).cast("double"), 6).as("d6"))
      val m = dist.groupBy("vec_id").agg(min(col("d6")).as("md"))
      val assign = dist.join(m, Seq("vec_id"))
        .filter(col("d6") === col("md"))
        .groupBy("vec_id").agg(min(col("cl")).as("cl"),
          min(col("md")).as("md"))
      assign.groupBy("cl")
        .agg(count(lit(1)).as("n_assigned"),
          round(sum(col("md").cast(Dets.Dec)).cast("double"), 4)
            .as("inertia4"))
        .orderBy("cl")
    }),

    // PCA top principal direction by power iteration — dense linear
    // algebra as relational operators (the whitening/projection
    // pre-step of an embedding pipeline). Determinism design: NO
    // arbitrary double ever rounds to decimal (the engines' double→
    // decimal roundings can disagree at 1 ulp — Spark rounds the
    // SHORTEST decimal rendering, DuckDB the exact binary value, and
    // 8 M cross products make a collision near-certain). Instead the
    // whole pipeline is EXACT integer arithmetic: inputs floor-quantize
    // to a 2^20 grid (float·2^20 is exact in double, floor has no tie),
    // the Gram/mean-correction matrix is an exact DECIMAL(38,0)
    // (n·Σxy − Σx·Σy — scale-free for the eigenvector), each mat-vec
    // against the integer-quantized v is an exact associative decimal
    // sum, and normalization is by the exact max component with the
    // ratio re-floored to the 2^20 grid. The emitted v3/λ are raw
    // doubles obtained ONLY through exact-decimal→double casts
    // (correctly rounded in both engines, probe-verified) and
    // deterministic double division. The covariance localCheckpoints —
    // it feeds 3 mat-vecs + the Rayleigh quotient (the q153-PageRank
    // multi-job pattern); the only corpus-sized job is the one
    // self-join Gram pass, map-side combined to 4096 cells.
    "q217_pca_power" -> ((s, dir) => {
      val S = 1048576L // 2^20 quantization grid
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val flat = t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
        .select(col("vec_id"), col("d"),
          floor(col("x").cast("double") * S).cast("long").as("xi"))
      // r15: the Gram cells come from a per-row OUTER PRODUCT (dim² is
      // a constant 4096, bounded by the vector width, never the data),
      // so the former flat⋈flat self-join on vec_id — two corpus-sized
      // exchanges + an 8.2 M-row merge join before the aggregation —
      // is two chained codegen posexplodes feeding the same
      // map-side-combined 4096-cell agg (guide §2.4): zero exchanges
      // before the partial aggregation. (NOT a transform/flatten
      // lambda: higher-order functions evaluate interpreted, and 8.2 M
      // per-element virtual calls measured SLOWER than the join it
      // replaces.) Identical integer products (|xi| ≤ 2^20, the
      // product fits a long exactly), identical decimal sums.
      val gram = t(s, dir, "embeddings")
        .select(col("embedding"), posexplode(col("embedding"))
          .as(Seq("i", "xa")))
        .select(col("i"), col("xa"), posexplode(col("embedding"))
          .as(Seq("j", "xb")))
        .groupBy("i", "j")
        .agg(sum(d38(
          floor(col("xa").cast("double") * S).cast("long")
            * floor(col("xb").cast("double") * S).cast("long")))
          .as("sxy"))
      val mrg = flat.groupBy(col("d").as("k"))
        .agg(sum(col("xi")).as("sx"), count(lit(1)).as("n"))
      val cov = gram
        .join(broadcast(mrg.select(col("k").as("i"), col("sx").as("sxi"),
          col("n"))), Seq("i"))
        .join(broadcast(mrg.select(col("k").as("j"), col("sx").as("sxj"))),
          Seq("j"))
        .select(col("i"), col("j"),
          (d38(col("n")) * col("sxy") - d38(col("sxi")) * d38(col("sxj")))
            .as("aij"))
        .localCheckpoint()
      var v = mrg.select(col("k").as("i"), lit(1L).as("v"))
      var r: DataFrame = null
      for (_ <- 1 to 3) {
        val w = cov.join(broadcast(v.select(col("i").as("j"), col("v"))),
            Seq("j"))
          .groupBy("i").agg(sum(col("aij") * col("v")).as("w"))
        val mx = w.agg(max(abs(col("w"))).as("mw"))
        r = w.crossJoin(broadcast(mx))
          .select(col("i"),
            (col("w").cast("double") / col("mw").cast("double")).as("r"))
          .localCheckpoint()
        v = r.select(col("i"), floor(col("r") * S).cast("long").as("v"))
      }
      val num = cov
        .join(broadcast(v.select(col("i"), col("v").as("vi"))), Seq("i"))
        .join(broadcast(v.select(col("i").as("j"), col("v").as("vj"))),
          Seq("j"))
        .agg(sum(col("aij") * col("vi") * col("vj")).as("num"))
      val lam = num
        .crossJoin(broadcast(v.agg(sum(col("v") * col("v")).as("den"))))
        .crossJoin(broadcast(mrg.agg(max(col("n")).as("n"))))
        .select((col("num").cast("double") / col("den").cast("double")
          / (col("n") * (col("n") - 1)).cast("double")
          / lit(S.toDouble) / lit(S.toDouble)).as("lambda1"))
      r.crossJoin(broadcast(lam))
        .select((col("i") + 1).cast("long").as("dim"), col("r").as("v3"),
          col("lambda1"))
        .orderBy("dim")
    }),

    // MMR diversified re-rank — the redundancy-suppressing retrieval
    // finisher (pick results near the probe but far from each other):
    // greedy rel − 0.5·maxSim over probe 0's 10-deep cosine shortlist,
    // top-3. Shortlist + pair sims are distributed (one corpus scan,
    // one depth² broadcast self-join); the greedy is the documented
    // bounded driver finish (VectorOps.mmrRerank). The oracle unrolls
    // the 3 greedy steps as CTEs.
    "q220_mmr_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.api.VectorOps.mmrRerank(emb, "vec_id", "embedding", probe,
        depth = 10, k = 3, lambdaDiv = 0.5)
        .orderBy("rank")
    }),

    // Unrolled Lloyd k-means, ORACLE-GATED — the full clustering loop
    // the ANN tier trains with (q70/q132/q134 run sampled float Lloyd,
    // gated by recall specs): KmK clusters × KmIters assignment rounds
    // over milli-quantized embeddings, every distance / centroid /
    // inertia a 64-bit integer ([D5]), seeds the polyMix-smallest ids
    // — so DuckDB replays the ENTIRE training trajectory bit-exactly,
    // per-round member counts and inertia both. This is the trust
    // anchor for the k-means family: the float production path is
    // bounded by recall floors, the integer trace by a hash gate.
    // Scale: per round one broadcast centroid kernel (no join) + one
    // (cluster, dim) partial agg; see MlOps.kmeansTrace.
    "q247_kmeans_steps" -> ((s, dir) =>
      graft.api.MlOps.kmeansTrace(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = KmK, iters = KmIters)),

    // Integer-staged PQ codebook training trace, ORACLE-GATED — the
    // q247 pattern applied per subspace, closing the PQ family's trust
    // story (q132/q134 run the float production path, bounded by
    // recall floors; this replays the SAME per-subspace Lloyd in
    // int64 milli-units so DuckDB reproduces every round bit-exactly:
    // member counts AND inertia per (round, subspace, code)). Scale:
    // per round one broadcast m·ksub centroid-literal kernel over the
    // subvector table (no join) + one (j, code, dim) partial agg with
    // a bounded m·ksub·subdim driver fold — see PqOps.pqIntTrain.
    "q267_pq_trace" -> ((s, dir) => pqIntArtifacts(s, dir)._1),

    // ADC ranking in EXACT integer units over q267's trained model,
    // ORACLE-GATED — the second half of the PQ trust anchor: the
    // asymmetric-distance table (|probes|·m·ksub int64 sub-distances)
    // broadcasts into the final codes, partial sums collapse
    // map-side, bounded-heap top-k — the q132 ADC plan shape with the
    // 6dp float table replaced by the bit-replayable integer one, so
    // the oracle verifies codebooks, encoding AND ranking end-to-end.
    "q268_pq_adc_int" -> ((s, dir) =>
      graft.Caches.memo(s, s"pqint:$dir:adc") {
        val (_, cents, codes) = pqIntArtifacts(s, dir)
        graft.api.PqOps.pqIntAdcTopK(t(s, dir, "embeddings"), "vec_id",
          "embedding", 64, PqTrM, cents, codes, PqTrProbes, PqTrTopK)
      }),

    // ANN recall, ORACLE-GATED — the eval that completes the q267/q268
    // trust story: per probe, how many of the integer-ADC top-10
    // (q268) sit in the EXACT integer-L2 top-10 over the same
    // milli-quantized vectors. The float ANN tier's recall lives in
    // spec floors (RecallAuditSpec); here both ranking and ground
    // truth are bit-replayable, so the recall TABLE itself is
    // hash-gated — a zero-overlap probe reports a row saying so
    // ([D5] truncating permille). Measured at sf0.01: 100/100/0 ‰ —
    // honestly LOW, and that is the point: the q267 geometry (4
    // subspaces × 8 codes) is sized for oracle-replayable TRACE
    // gating, not retrieval quality; the production operating point
    // is q132's 16×16 layout at 0.833 overlap (RecallAuditSpec floor
    // 0.8). This key gates the MEASUREMENT machinery bit-exactly so
    // the production floors rest on an eval that is itself verified.
    // Exact side: broadcast 3-probe integer kernel over one corpus
    // scan, bounded-heap top-10 (documented broadcast-tiny BNLJ).
    "q284_adc_recall" -> ((s, dir) =>
      graft.Caches.memo(s, s"pqint:$dir:recall") {
        val emb = t(s, dir, "embeddings")
        val (_, cents, codes) = pqIntArtifacts(s, dir)
        val adc = graft.api.PqOps.pqIntAdcTopK(emb, "vec_id",
            "embedding", 64, PqTrM, cents, codes, PqTrProbes, PqTrTopK)
          .select(col("probe_id"), col("vec_id"))
        val q = emb.select(col("vec_id").cast("long").as("id"),
            expr("transform(embedding, x -> " +
              "cast(floor(cast(x as double) * 1000L) as bigint))")
              .as("e"))
          .filter(col("e").isNotNull)
        val probes = q.filter(col("id") < PqTrProbes)
          .select(col("id").as("probe_id"), col("e").as("pe"))
        val exact = graft.plans.GraftOps.topKPerGroup(
          broadcast(probes).join(q, col("id") =!= col("probe_id"))
            .select(col("probe_id"), col("id"),
              expr("aggregate(zip_with(pe, e, " +
                "(x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b)")
                .as("d")),
          Seq(col("probe_id")), Seq(col("d").asc, col("id").asc),
          PqTrTopK)
          .select(col("probe_id"), col("id").as("vec_id"))
        val ov = adc.join(exact, Seq("probe_id", "vec_id"), "left_semi")
          .groupBy("probe_id").agg(count(lit(1)).as("n_overlap"))
        probes.select("probe_id")
          .join(ov, Seq("probe_id"), "left")
          .select(col("probe_id"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
            expr(s"coalesce(n_overlap, 0L) * 1000L div $PqTrTopK")
              .as("recall_permille"))
          .orderBy("probe_id")
      }),

    // The q284 recall machinery at q132's PRODUCTION geometry (16
    // subspaces × 16 codes × 4 Lloyd rounds) and q132's TWO-STAGE
    // search — ADC shortlist of 32, exact re-rank, top-3 — so the
    // production operating point's top-3 overlap is a hash-gated
    // TABLE, not only a spec floor (r11 verdict item 6). Everything
    // is integer-exact on milli-quantized vectors: training replayed
    // by the same parameterized oracle CTE generator as q267, the
    // shortlist by integer ADC, the re-rank and the ground truth by
    // exact integer L2 with (d asc, id asc) tie-breaks. The re-rank
    // stage is why this tracks q132's 0.833 floor story rather than
    // q284's honestly-low raw-ADC permilles: ADC only has to land the
    // true top-3 anywhere in the 32-shortlist. Scale shape = q132:
    // codes equi-join per subspace, bounded-heap top-k, probes
    // broadcast; the exact side's corpus-scan BNLJ is the documented
    // ground-truth anchor, not the production path.
    "q285_adc_recall_prod" -> ((s, dir) =>
      graft.Caches.memo(s, s"pqprodint:$dir:recall") {
        val emb = t(s, dir, "embeddings")
        val (_, cents, codes) = pqProdIntArtifacts(s, dir)
        val short = graft.api.PqOps.pqIntAdcTopK(emb, "vec_id",
            "embedding", 64, PqPrM, cents, codes, PqPrProbes, PqPrShortK)
          .select(col("probe_id"), col("vec_id"))
        val q = emb.select(col("vec_id").cast("long").as("id"),
            expr("transform(embedding, x -> " +
              "cast(floor(cast(x as double) * 1000L) as bigint))")
              .as("e"))
          .filter(col("e").isNotNull)
        val probes = q.filter(col("id") < PqPrProbes)
          .select(col("id").as("probe_id"), col("e").as("pe"))
        val dExpr = expr("aggregate(zip_with(pe, e, " +
          "(x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b)")
        val rerank = graft.plans.GraftOps.topKPerGroup(
          short.join(q, col("vec_id") === col("id"))
            .join(broadcast(probes), Seq("probe_id"))
            .select(col("probe_id"), col("id"), dExpr.as("d")),
          Seq(col("probe_id")), Seq(col("d").asc, col("id").asc),
          PqPrTopK)
          .select(col("probe_id"), col("id").as("vec_id"))
        val exact = graft.plans.GraftOps.topKPerGroup(
          broadcast(probes).join(q, col("id") =!= col("probe_id"))
            .select(col("probe_id"), col("id"), dExpr.as("d")),
          Seq(col("probe_id")), Seq(col("d").asc, col("id").asc),
          PqPrTopK)
          .select(col("probe_id"), col("id").as("vec_id"))
        val ov = rerank.join(exact, Seq("probe_id", "vec_id"), "left_semi")
          .groupBy("probe_id").agg(count(lit(1)).as("n_overlap"))
        probes.select("probe_id")
          .join(ov, Seq("probe_id"), "left")
          .select(col("probe_id"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
            expr(s"coalesce(n_overlap, 0L) * 1000L div $PqPrTopK")
              .as("recall_permille"))
          .orderBy("probe_id")
      }),

    // PQ codebook health — the operational census an ANN owner reads
    // before trusting a trained quantizer (recall evals q284/q285 say
    // how SEARCH behaves; this says whether the CODEBOOK itself is
    // sound): per subspace, codes in use vs dead (a dead code wastes
    // a codebook slot and signals an unconverged or skewed training),
    // the assignment-entropy (uniform = all slots pulling their
    // weight), the top code's share, and the residual inertia. Pure
    // derivation over the memoized q267 trace's FINAL round — zero
    // new training, one window + one keyed agg over m·ksub rows;
    // entropy terms 6dp-quantized + decimal-summed [D2] (q339's
    // text), top share the [D5] truncating permille.
    // Matryoshka truncation-recall ladder (Kusupati et al. 2022 MRL,
    // public method) — the "how many dims can we drop" audit run
    // before truncating stored embeddings (MRL serving keeps a PREFIX
    // of each vector; this measures what that costs on THIS corpus):
    // for prefix widths {8, 16, 32, 64}, the exact integer-L2 top-3
    // over the truncated milli-quantized vectors vs the full-64 exact
    // top-3, overlap summed over the 10 probes ([D5] truncating
    // permille); width 64 is the identity sanity row (1000‰ by
    // construction, so a broken harness is visible in the table
    // itself). ONE broadcast-probe pair pass computes all four prefix
    // distances (slice() + the same zip_with fold — no re-scan per
    // width; the pair frame persists once), then four bounded-heap
    // top-k + semi-join overlaps. The pair scan is the documented
    // q284 ground-truth-anchor BNLJ class.
    "q366_matryoshka_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.select(col("vec_id").cast("long").as("id"),
          expr("transform(embedding, x -> " +
            "cast(floor(cast(x as double) * 1000L) as bigint))").as("e"))
        .filter(col("e").isNotNull)
      val probes = q.filter(col("id") < MrlProbes)
        .select(col("id").as("probe_id"), col("e").as("pe"))
      val dCols = MrlDims.map { w =>
        expr(s"aggregate(zip_with(slice(pe, 1, $w), slice(e, 1, $w), " +
          "(x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b)")
          .as(s"d_$w")
      }
      val pairs = graft.Caches.persistTracked(
        broadcast(probes).join(q, col("id") =!= col("probe_id"))
          .select(col("probe_id") +: col("id") +: dCols: _*))
      def topk(w: Int) = graft.plans.GraftOps.topKPerGroup(pairs,
        Seq(col("probe_id")), Seq(col(s"d_$w").asc, col("id").asc), MrlK)
        .select(col("probe_id"), col("id"))
      val full = topk(MrlDims.last)
      val np = probes.agg(count(lit(1)).as("n_probes"))
      MrlDims.map { w =>
        topk(w).join(full, Seq("probe_id", "id"), "left_semi")
          .agg(count(lit(1)).as("n_overlap"))
          .crossJoin(broadcast(np))
          .select(lit(w).as("dims"), col("n_probes"),
            (col("n_probes") * MrlK).as("n_true"), col("n_overlap"),
            expr(s"1000L * n_overlap div (n_probes * $MrlK)")
              .as("recall_pm"))
      }.reduce(_ unionByName _).orderBy("dims")
    }),

    "q341_pq_code_health" -> ((s, dir) =>
      codeHealth(pqIntArtifacts(s, dir)._1, PqTrK, PqTrIters)),

    // The same codebook-health readout at q132's PRODUCTION geometry,
    // derived from q285's (16,16,4) integer training trace (r12
    // verdict item 6: the tree's most expensive training memo gets a
    // second consumer, so its build is charged to a `shared:` bench
    // line like every other family build instead of riding q285
    // alone). Zero new training — one window + one keyed agg over the
    // m·ksub final-round trace rows, same [D2]/[D5] staging as q341.
    "q359_pq_code_health_prod" -> ((s, dir) =>
      codeHealth(pqProdIntArtifacts(s, dir)._1, PqPrK, PqPrIters))
  )

  /** q341/q359's shared derivation over a PQ training trace's FINAL
    * round: per subspace, codes in use vs dead, assignment entropy
    * (6dp-quantized + decimal-summed [D2]), top code's share ([D5]
    * truncating permille), residual inertia. */
  private def codeHealth(trace: DataFrame, k: Int, iters: Int)
  : DataFrame = {
    val fin = trace
      .filter(col("round") === iters)
      .withColumn("n",
        sum(col("n_vecs")).over(Window.partitionBy("j")))
    fin.groupBy("j").agg(
        count(lit(1)).as("n_used"),
        max(col("n")).as("n_assigned"),
        max(col("n_vecs")).as("max_code"),
        sum(col("inertia")).as("inertia"),
        sum(round(-(col("n_vecs").cast("double") / col("n")
          .cast("double"))
          * log(col("n_vecs").cast("double") / col("n").cast("double")),
          6).cast(Dets.Dec)).as("hd"))
      .select(col("j"), col("n_used"),
        (lit(k.toLong) - col("n_used")).as("n_dead"),
        col("n_assigned"),
        expr("1000 * max_code div n_assigned").as("top_share_pm"),
        round(col("hd").cast("double"), 6).as("h6"),
        col("inertia"))
      .orderBy("j")
  }

  /** q247 geometry: 4 clusters, 3 unrolled Lloyd rounds, milli-unit
    * quantization (the kmeansTrace default). */
  private val KmK = 4
  private val KmIters = 3

  private val sqlCos = Sql.cosine("a.pe", "b.embedding")

  /** q124's neighbourhood size. */
  private[graft] val DensityK = 5

  /** q132's PQ layout: 16 subspaces of 4 dims, 16 codes each, 4 Lloyd
    * rounds (16 codes per vector vs 64 floats raw — 16× compression),
    * ADC shortlist of 32 re-ranked exactly to top-3. */
  private[graft] val PqM = 16
  private[graft] val PqKsub = 16
  private[graft] val PqIters = 4
  private[graft] val PqShortK = 32

  /** q134's IVFPQ layout: 8 learned cells (4 Lloyd rounds), residual
    * PQ at the q132 code budget, 6 cells probed, shortlist 48. */
  private[graft] val IvfPqCells = 8
  private[graft] val IvfPqNprobe = 6
  private[graft] val IvfPqShortK = 48

  /** q132's PQ training artifacts (codebooks, encoded corpus), memoized
    * per (session, dir, layout). Shared between the q132 query body and
    * the bench memo-prime registry ([[graft.SharedMemos]]) so the
    * training build is charged to its own `shared:` line, not to
    * whichever key sweeps first. */
  private[graft] def pqProdArtifacts(s: SparkSession, dir: String)
  : (DataFrame, DataFrame) = {
    val emb = t(s, dir, "embeddings")
    val mk = s"pq:$dir:64:$PqM:$PqKsub:$PqIters"
    val cb = graft.Caches.memo(s, s"$mk:cb") {
      graft.api.PqOps.pqCodebooks(
        emb, "vec_id", "embedding", 64, PqM, PqKsub, PqIters)
    }
    val codes = graft.Caches.memo(s, s"$mk:codes") {
      graft.api.PqOps.pqEncode(emb, "vec_id", "embedding", 64, PqM, cb)
    }
    (cb, codes)
  }

  /** q134's IVF+PQ training artifacts (cell centroids, residual
    * codebooks, cell-tagged codes), memoized per (session, dir,
    * layout) — same sharing contract as [[pqProdArtifacts]]. The
    * intermediate cells/residual frames stay memoized too: the
    * codebook/code builds read them lazily on first materialization. */
  private[graft] def ivfPqArtifacts(s: SparkSession, dir: String)
  : (DataFrame, DataFrame, DataFrame) = {
    val emb = t(s, dir, "embeddings")
    val mk = s"ivfpq:$dir:64:$IvfPqCells:4:$PqM:$PqKsub:$PqIters"
    // r15: the memoized assignment CARRIES the vector (id, v, cell) —
    // centroids aggregate it directly and residuals are a
    // broadcast-map, where the (id, cell)-only form re-joined the
    // corpus by id twice (guide §2.4); rows and values are identical
    // (the join was 1:1 on id).
    val cells = graft.Caches.memo(s, s"$mk:cellsfull") {
      graft.sources.IvfIndex.kmeansAssigned(
        emb, "vec_id", "embedding", IvfPqCells, 4, 64)
    }
    val cents = graft.Caches.memo(s, s"$mk:cents") {
      graft.api.PqOps.cellCentroidsAssigned(cells, 64)
    }
    val res = graft.Caches.memo(s, s"$mk:res") {
      graft.api.PqOps.residualsAssigned(cells, cents)
    }
    val cb = graft.Caches.memo(s, s"$mk:cb") {
      graft.api.PqOps.pqCodebooks(res, "id", "res", 64, PqM, PqKsub,
        PqIters)
    }
    val codes = graft.Caches.memo(s, s"$mk:codes") {
      graft.api.PqOps.pqEncode(res, "id", "res", 64, PqM, cb)
        .join(res.select("id", "cell"), Seq("id"))
    }
    (cents, cb, codes)
  }

  /** The q267/q268/q284 integer-PQ training artifacts (trace, cents,
    * codes) from ONE training run per (session, dir): memo's build is
    * by-name, so on the first access a single pqIntTrain call fills
    * the shared `built` slot for all three keys; every later access in
    * the session hits the cache — the Caches.memo one-training-run
    * convention (q132/q235) applied to a multi-output trainer. */
  private[graft] def pqIntArtifacts(s: SparkSession, dir: String)
  : (DataFrame, DataFrame, DataFrame) =
    pqIntArtifactsAt(s, dir, "pqint", PqTrM, PqTrK, PqTrIters)

  /** q285's integer-PQ training at the q132 PRODUCTION geometry —
    * same one-training-run memo convention under its own key prefix. */
  private[graft] def pqProdIntArtifacts(s: SparkSession, dir: String)
  : (DataFrame, DataFrame, DataFrame) =
    pqIntArtifactsAt(s, dir, "pqprodint", PqPrM, PqPrK, PqPrIters)

  private def pqIntArtifactsAt(s: SparkSession, dir: String,
    prefix: String, m: Int, k: Int, iters: Int)
  : (DataFrame, DataFrame, DataFrame) = {
    var built: Option[(DataFrame, DataFrame, DataFrame)] = None
    def b(i: Int): DataFrame = {
      if (built.isEmpty)
        built = Some(graft.api.PqOps.pqIntTrain(t(s, dir, "embeddings"),
          "vec_id", "embedding", 64, m, k, iters))
      built.get.productElement(i).asInstanceOf[DataFrame]
    }
    (graft.Caches.memo(s, s"$prefix:$dir:trace")(b(0)),
      graft.Caches.memo(s, s"$prefix:$dir:cents")(b(1)),
      graft.Caches.memo(s, s"$prefix:$dir:codes")(b(2)))
  }

  /** q267/q268's integer-trace PQ layout: 4 subspaces of 16 dims,
    * 8 codes each, 3 Lloyd rounds, milli-unit quantization; q268
    * ranks the 3 lowest-id probes to top-10 in exact integer ADC
    * units. Deliberately smaller than q132's production layout —
    * the oracle unrolls one CTE block per Lloyd round, and the
    * machinery under test (per-subspace training, encoding, ADC)
    * is identical at any geometry. */
  /** q366's MRL audit geometry: prefix widths, probe count, top-k.
    * Declared BEFORE the oracle map's interpolation sites (the q362
    * init-order lesson); widths must ascend and end at the full 64. */
  private[graft] val MrlDims = Seq(8, 16, 32, 64)
  private[graft] val MrlProbes = 10
  private[graft] val MrlK = 3

  private[graft] val PqTrM = 4
  private[graft] val PqTrK = 8
  private[graft] val PqTrIters = 3

  /** q285's layout = q132's production geometry (16 subspaces × 16
    * codes × 4 Lloyd rounds), trained INTEGER-exactly so the recall
    * measurement of the production operating point is itself a
    * hash-gated table (r11 verdict item 6): 10 probes, the q132
    * two-stage search (ADC shortlist 32 → exact re-rank → top-3)
    * against the exact integer-L2 top-3 over the same quantized
    * vectors. */
  private[graft] val PqPrM = 16
  private[graft] val PqPrK = 16
  private[graft] val PqPrIters = 4
  private[graft] val PqPrProbes = 10
  private[graft] val PqPrShortK = 32
  private[graft] val PqPrTopK = 3
  private[graft] val PqTrProbes = 3
  private[graft] val PqTrTopK = 10

  /** The q102 LSH planes, embedded in the oracle as exact doubles:
    * Float.toString would NOT round-trip through DuckDB's double parse
    * (0.1f as double is 0.10000000149011612, not 0.1), and graft_dot
    * widens each float to double before multiplying — so the literals
    * must be the float values' exact double images. */
  private def lshPlanesValues: String =
    graft.api.VectorOps.gaussianPlanes(LshBands * LshPlanesPerBand, 64, 42L)
      .zipWithIndex
      .map { case (p, i) =>
        s"($i, [${p.map(_.toDouble.toString).mkString(", ")}])"
      }.mkString(",\n")

  /** The full LSH pair replay as a CTE chain ending in
    * `vpair(id_lo, id_hi, cos4)` — shared by the q102 (pairs) and q110
    * (component closure) oracles so both gate the SAME pipeline. */
  private def lshPairCteSql: String =
    s"""planes(pid, p) AS (VALUES
       |$lshPlanesValues
       |), keys AS (
       |  SELECT e.vec_id AS id, pid // $LshPlanesPerBand AS band,
       |         CAST(SUM(CASE WHEN list_sum(list_transform(range(1, 65),
       |                i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i])) >= 0
       |              THEN 1 << (pid % $LshPlanesPerBand) ELSE 0 END)
       |           AS BIGINT) AS bkey
       |  FROM embeddings e CROSS JOIN planes pl
       |  GROUP BY e.vec_id, pid // $LshPlanesPerBand
       |), cand AS (
       |  SELECT DISTINCT a.id AS id_lo, b.id AS id_hi
       |  FROM keys a JOIN keys b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
       |), vpair AS (
       |  SELECT c.id_lo, c.id_hi,
       |         ROUND(${Sql.cosine("a.embedding", "b.embedding")}, 4) AS cos4
       |  FROM cand c JOIN embeddings a ON c.id_lo = a.vec_id
       |              JOIN embeddings b ON c.id_hi = b.vec_id
       |  WHERE ROUND(${Sql.cosine("a.embedding", "b.embedding")}, 4) >= 0.35
       |)""".stripMargin

  /** q320's drift summaries over the exact decimal cross-moment sums
    * (sdot, saa, sbb, sdd) — shared texts, one IEEE tree each; NULL
    * when a half is empty (degenerate split). */
  private[operators] object DriftFormula {
    val cos6: String = "CASE WHEN CAST(saa AS DOUBLE) > 0 " +
      "AND CAST(sbb AS DOUBLE) > 0 THEN " +
      "round(CAST(sdot AS DOUBLE) / (sqrt(CAST(saa AS DOUBLE)) " +
      "* sqrt(CAST(sbb AS DOUBLE))), 6) END"
    val l26: String = "round(sqrt(CAST(sdd AS DOUBLE)), 6)"
    val nr6: String = "CASE WHEN CAST(sbb AS DOUBLE) > 0 THEN " +
      "round(sqrt(CAST(saa AS DOUBLE)) / sqrt(CAST(sbb AS DOUBLE)), 6) " +
      "END"
  }

  val oracle: Map[String, String] = Map(

    // identical parity split, q63 centroid staging, 12dp cross-moment
    // terms, and the SAME summary trees
    "q320_embedding_drift" -> {
      val flagSql = s"(${graft.operators.GraphQueries.polyMixSql(
        graft.operators.GraphQueries.pmodSql("vec_id"))}) % 2"
      s"""WITH fl AS (
         |  SELECT $flagSql AS h, embedding FROM embeddings),
         |flat AS (
         |  SELECT h, unnest(embedding) AS x,
         |         generate_subscripts(embedding, 1) AS pos
         |  FROM fl),
         |dims AS (
         |  SELECT h, pos, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
         |           / CAST(COUNT(*) AS BIGINT) AS c
         |  FROM flat GROUP BY 1, 2),
         |ab AS (
         |  SELECT a.n AS na, b.n AS nb,
         |         CAST(ROUND(a.c * b.c, 12) AS DECIMAL(38,12)) AS dot,
         |         CAST(ROUND(a.c * a.c, 12) AS DECIMAL(38,12)) AS aa,
         |         CAST(ROUND(b.c * b.c, 12) AS DECIMAL(38,12)) AS bb,
         |         CAST(ROUND((a.c - b.c) * (a.c - b.c), 12)
         |           AS DECIMAL(38,12)) AS dd
         |  FROM dims a JOIN dims b ON b.pos = a.pos
         |  WHERE a.h = 0 AND b.h = 1),
         |m AS (
         |  SELECT CAST(MAX(na) AS BIGINT) AS n0,
         |         CAST(MAX(nb) AS BIGINT) AS n1,
         |         CAST(SUM(dot) AS DECIMAL(38,12)) AS sdot,
         |         CAST(SUM(aa) AS DECIMAL(38,12)) AS saa,
         |         CAST(SUM(bb) AS DECIMAL(38,12)) AS sbb,
         |         CAST(SUM(dd) AS DECIMAL(38,12)) AS sdd
         |  FROM ab)
         |SELECT n0, n1, ${DriftFormula.cos6} AS cos6,
         |       ${DriftFormula.l26} AS l2_6,
         |       ${DriftFormula.nr6} AS normratio6
         |FROM m""".stripMargin
    },
    "q62_sim_topk" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
         |           FROM embeddings WHERE vec_id < 10)
         |SELECT probe_id, vec_id, cos4, rn FROM (
         |  SELECT a.probe_id, b.vec_id,
         |         -- + 0 normalizes a possible -0.0 (Spark round never emits it)
         |         ROUND($sqlCos, 4) + 0 AS cos4,
         |         ROW_NUMBER() OVER (PARTITION BY a.probe_id
         |           ORDER BY ROUND($sqlCos, 4) DESC NULLS LAST,
         |                    b.vec_id ASC NULLS FIRST) AS rn
         |  FROM p a JOIN embeddings b ON b.vec_id != a.probe_id) x
         |WHERE rn <= 5
         |ORDER BY probe_id ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,

    // q62's replay with the label exclusion in the join predicate —
    // SQL three-valued logic drops NULL-label candidates on both
    // engines identically
    "q233_hard_negatives" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, label AS plabel,
         |                  embedding AS pe
         |           FROM embeddings WHERE vec_id < 10)
         |SELECT probe_id, vec_id, cos4, rn FROM (
         |  SELECT a.probe_id, b.vec_id,
         |         -- + 0 normalizes a possible -0.0 (Spark round never emits it)
         |         ROUND($sqlCos, 4) + 0 AS cos4,
         |         ROW_NUMBER() OVER (PARTITION BY a.probe_id
         |           ORDER BY ROUND($sqlCos, 4) DESC NULLS LAST,
         |                    b.vec_id ASC NULLS FIRST) AS rn
         |  FROM p a JOIN embeddings b ON b.vec_id != a.probe_id
         |                            AND b.label != a.plabel) x
         |WHERE rn <= 5
         |ORDER BY probe_id ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,

    "q124_knn_density" ->
      s"""WITH pr AS (
         |  SELECT a.vec_id AS va, a.label AS label, b.vec_id AS vb,
         |         -- + 0 normalizes a possible -0.0 (Spark round never emits it)
         |         ROUND(${Sql.cosine("a.embedding", "b.embedding")}, 4) + 0
         |           AS cos4
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id != b.vec_id),
         |rk AS (
         |  SELECT va, label, cos4,
         |         ROW_NUMBER() OVER (PARTITION BY va
         |           ORDER BY cos4 DESC NULLS LAST, vb ASC NULLS FIRST) AS rn
         |  FROM pr)
         |SELECT va AS vec_id, label, COUNT(*) AS k_nn,
         |       ROUND(CAST(SUM(CAST(cos4 AS DECIMAL(38,6))) AS DOUBLE)
         |             / COUNT(*), 4) AS density4
         |FROM rk WHERE rn <= $DensityK GROUP BY va, label
         |ORDER BY vec_id ASC NULLS FIRST""".stripMargin,

    "q97_knn_label" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe,
         |                  label AS true_label
         |           FROM embeddings WHERE vec_id < 10),
         |nn AS (
         |  SELECT probe_id, vec_id, label FROM (
         |    SELECT a.probe_id, b.vec_id, b.label,
         |           ROW_NUMBER() OVER (PARTITION BY a.probe_id
         |             ORDER BY ROUND($sqlCos, 4) DESC NULLS LAST,
         |                      b.vec_id ASC NULLS FIRST) AS rn
         |    FROM p a JOIN embeddings b ON b.vec_id >= 10) x
         |  WHERE rn <= 5),
         |v AS (SELECT probe_id, label, COUNT(*) AS votes
         |      FROM nn GROUP BY probe_id, label)
         |SELECT p.probe_id, p.true_label, v.label AS pred_label, v.votes
         |FROM v JOIN p ON v.probe_id = p.probe_id
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY v.probe_id
         |  ORDER BY v.votes DESC NULLS LAST, v.label ASC NULLS FIRST) = 1
         |ORDER BY p.probe_id ASC NULLS FIRST""".stripMargin,

    "q101_embed_outliers" ->
      """WITH nrm AS (
        |  SELECT label,
        |         ROUND(SQRT(list_sum(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS x
        |  FROM embeddings),
        |st AS (
        |  SELECT label, COUNT(*) AS n,
        |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
        |  FROM nrm GROUP BY label),
        |ms AS (
        |  SELECT label, n, sx / n AS mean,
        |         SQRT(GREATEST(CAST(0 AS DOUBLE),
        |           sxx / n - (sx / n) * (sx / n))) AS sd
        |  FROM st)
        |SELECT nrm.label, MAX(ms.n) AS n,
        |       ROUND(MAX(ms.mean), 4) AS mean4,
        |       ROUND(MAX(ms.sd), 4) AS sd4,
        |       CAST(SUM(CASE WHEN ABS(nrm.x - ms.mean) > 2 * ms.sd
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        |FROM nrm JOIN ms ON nrm.label = ms.label
        |GROUP BY nrm.label
        |ORDER BY nrm.label ASC NULLS FIRST""".stripMargin,

    "q63_centroid_agg" ->
      """WITH flat AS (
        |  SELECT label, unnest(embedding) AS x,
        |         generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings
        |), per AS (
        |  SELECT label, dim,
        |         -- + 0 normalizes -0.0: DuckDB ROUND keeps the IEEE sign,
        |         -- Spark's BigDecimal round cannot produce it
        |         ROUND(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
        |               / COUNT(*), 4) + 0 AS c
        |  FROM flat GROUP BY label, dim
        |), cnt AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label)
        |SELECT per.label, per.dim, per.c, cnt.n
        |FROM per JOIN cnt ON per.label = cnt.label
        |ORDER BY per.label ASC NULLS FIRST, per.dim ASC NULLS FIRST""".stripMargin,

    "q96_quantize" -> {
      val lv = 255
      val code = (x: String) =>
        s"CASE WHEN mxs[i + 1] = mns[i + 1] THEN 0 " +
          s"ELSE CAST(round((CAST($x AS DOUBLE) - mns[i + 1]) " +
          s"/ (mxs[i + 1] - mns[i + 1]) * $lv) AS INT) END"
      s"""WITH flat AS (
         |  SELECT unnest(embedding) AS x,
         |         generate_subscripts(embedding, 1) AS dim
         |  FROM embeddings
         |), st AS (
         |  SELECT dim, MIN(CAST(x AS DOUBLE)) AS mn,
         |         MAX(CAST(x AS DOUBLE)) AS mx
         |  FROM flat GROUP BY dim
         |), pk AS (
         |  SELECT list(mn ORDER BY dim ASC) AS mns,
         |         list(mx ORDER BY dim ASC) AS mxs
         |  FROM st
         |), q AS (
         |  SELECT vec_id,
         |         list_transform(range(0, 64),
         |           i -> ${code("embedding[i + 1]")}) AS codes,
         |         embedding, mns, mxs
         |  FROM embeddings CROSS JOIN pk
         |)
         |SELECT vec_id, array_to_string(codes, ',') AS codes_csv,
         |       ROUND(SQRT(list_sum(list_transform(range(0, 64), i ->
         |         POWER(CAST(embedding[i + 1] AS DOUBLE)
         |           - (mns[i + 1] + CAST(codes[i + 1] AS DOUBLE)
         |              / $lv * (mxs[i + 1] - mns[i + 1])), 2)))), 4) AS rmse4
         |FROM q
         |ORDER BY vec_id ASC NULLS FIRST""".stripMargin
    },

    "q69_embed_neardup" ->
      s"""SELECT a.vec_id AS id_lo, b.vec_id AS id_hi,
         |       ROUND(${Sql.cosine("a.embedding", "b.embedding")}, 4) AS cos4
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ROUND(${Sql.cosine("a.embedding", "b.embedding")}, 4) >= 0.35
         |ORDER BY id_lo ASC NULLS FIRST, id_hi ASC NULLS FIRST""".stripMargin,

    // the same plane literals (JL seed), the same left-fold dot and
    // cosine trees, the identical 4dp-then-integer gap staging
    "q390_jl_distortion" -> {
      val jlPlanes = graft.api.VectorOps.gaussianPlanes(JlDim, 64, JlSeed)
        .zipWithIndex
        .map { case (p, i) =>
          s"($i, [${p.map(_.toDouble.toString).mkString(", ")}])"
        }.mkString(",\n")
      s"""WITH planes(pid, p) AS (VALUES
         |$jlPlanes
         |), proj AS (
         |  SELECT e.vec_id, pl.pid,
         |         list_sum(list_transform(range(1, 65),
         |           i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i]))
         |           AS dot
         |  FROM embeddings e CROSS JOIN planes pl),
         |y AS (
         |  SELECT vec_id, list(dot ORDER BY pid ASC) AS y
         |  FROM proj GROUP BY vec_id),
         |g AS (
         |  SELECT ROUND(${Sql.cosine("a.embedding", "b.embedding")}, 4)
         |           AS c64,
         |         ROUND(${Sql.cosine("ya.y", "yb.y")}, 4) AS c16
         |  FROM embeddings a
         |  JOIN embeddings b ON b.vec_id = a.vec_id + $JlGap
         |  JOIN y ya ON ya.vec_id = a.vec_id
         |  JOIN y yb ON yb.vec_id = b.vec_id),
         |m AS (
         |  SELECT COUNT(*) AS n_pairs,
         |         CAST(SUM(CAST(ROUND(ROUND(abs(c16 - c64), 4) * 10000)
         |                       AS BIGINT)) AS BIGINT) AS sg,
         |         MAX(ROUND(abs(c16 - c64), 4)) AS max_gap4
         |  FROM g)
         |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
         |       ROUND(CAST(sg // n_pairs AS DOUBLE) / 1e4, 4)
         |         AS mean_gap4,
         |       max_gap4
         |FROM m""".stripMargin
    },

    // Band keys replayed from the embedded planes: bit i of band b's key
    // is the sign of dot(v, plane[b*8+i]); candidates are DISTINCT
    // same-(band, key) pairs (set-equal to the first-matching-band rule);
    // verify at the same 4dp-rounded cosine threshold.
    "q102_embed_lsh" ->
      s"""WITH $lshPairCteSql
         |SELECT id_lo, id_hi, cos4 FROM vpair
         |ORDER BY id_lo ASC NULLS FIRST, id_hi ASC NULLS FIRST""".stripMargin,

    // Same verified pair graph closed to components (the q77 recursive
    // replay) — keep-list semantics over the embedding modality.
    "q110_semdedup" ->
      s"""WITH RECURSIVE $lshPairCteSql,
         |ed AS (SELECT id_lo AS src, id_hi AS dst FROM vpair
         |       UNION SELECT id_hi, id_lo FROM vpair),
         |reach(node, lab) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT ed.dst, r.lab FROM reach r JOIN ed ON ed.src = r.node
         |)
         |SELECT node AS vec_id, MIN(lab) AS cluster_id,
         |       CAST(CASE WHEN MIN(lab) = node THEN 1 ELSE 0 END AS INT)
         |         AS keep
         |FROM reach GROUP BY node
         |ORDER BY vec_id ASC NULLS FIRST""".stripMargin,

    // Exact replay of the IVF pipeline: per-label decimal-mean centroids
    // (CentroidAggregator's micros-sum → ROUND(sum/n, 4), the q63 CTE),
    // coarse rank of the 4dp probe-centroid cosines with cell tie-break,
    // fine 4dp cosines in the two selected cells with vec_id tie-break.
    "q70_ann_ivf" -> {
      val coarseCos = Sql.cosine("p.pe", "c.cent")
      val fineCos = Sql.cosine("p.pe", "b.embedding")
      s"""WITH flat AS (
         |  SELECT label, unnest(embedding) AS x,
         |         generate_subscripts(embedding, 1) AS dim
         |  FROM embeddings
         |), per AS (
         |  SELECT label, dim,
         |         ROUND(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
         |               / COUNT(*), 4) + 0 AS c
         |  FROM flat GROUP BY label, dim
         |), cents AS (
         |  SELECT label AS cell, list(c ORDER BY dim ASC) AS cent
         |  FROM per GROUP BY label
         |), p AS (
         |  SELECT vec_id AS probe_id, embedding AS pe
         |  FROM embeddings WHERE vec_id < 10
         |), coarse AS (
         |  SELECT probe_id, cell FROM (
         |    SELECT p.probe_id, c.cell,
         |           ROW_NUMBER() OVER (PARTITION BY p.probe_id
         |             ORDER BY ROUND($coarseCos, 4) DESC NULLS LAST,
         |                      c.cell ASC NULLS FIRST) AS crk
         |    FROM p CROSS JOIN cents c) x
         |  WHERE crk <= 2
         |)
         |SELECT probe_id, vec_id, cos4, rn FROM (
         |  SELECT co.probe_id, b.vec_id,
         |         ROUND($fineCos, 4) + 0 AS cos4,
         |         ROW_NUMBER() OVER (PARTITION BY co.probe_id
         |           ORDER BY ROUND($fineCos, 4) DESC NULLS LAST,
         |                    b.vec_id ASC NULLS FIRST) AS rn
         |  FROM coarse co
         |  JOIN p ON p.probe_id = co.probe_id
         |  JOIN embeddings b ON b.label = co.cell
         |                   AND b.vec_id != co.probe_id) f
         |WHERE rn <= 3
         |ORDER BY probe_id ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin
    },

    "q206_embed_dim_stats" ->
      """WITH flat AS (
        |  SELECT unnest(embedding) AS x,
        |         generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |g AS (
        |  SELECT dim, COUNT(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |                  AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
        |    CAST(MIN(x) AS DOUBLE) AS min_x,
        |    CAST(MAX(x) AS DOUBLE) AS max_x
        |  FROM flat GROUP BY dim)
        |SELECT CAST(dim AS BIGINT) AS dim, n,
        |       ROUND(sx / n, 4) AS mean4,
        |       -- + 0 normalizes -0.0 (Spark's round never emits it)
        |       ROUND((sx2 - sx * sx / n) / (n - 1), 4) + 0 AS var4,
        |       min_x, max_x
        |FROM g ORDER BY dim ASC NULLS FIRST""".stripMargin,

    "q216_nearest_centroid" ->
      """WITH flat AS (
        |  SELECT vec_id, label,
        |         generate_subscripts(embedding, 1) AS dim,
        |         unnest(embedding) AS x
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS cl, dim,
        |    ROUND(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
        |          / COUNT(*), 4) AS c4
        |  FROM flat GROUP BY 1, 2),
        |dist AS (
        |  SELECT f.vec_id, c.cl,
        |    ROUND(CAST(SUM(CAST((CAST(f.x AS DOUBLE) - c.c4)
        |                        * (CAST(f.x AS DOUBLE) - c.c4)
        |                        AS DECIMAL(38,8))) AS DOUBLE), 6) AS d6
        |  FROM flat f JOIN cent c ON f.dim = c.dim
        |  GROUP BY 1, 2),
        |m AS (SELECT vec_id, MIN(d6) AS md FROM dist GROUP BY 1),
        |assign AS (
        |  SELECT d.vec_id, MIN(d.cl) AS cl, MIN(m.md) AS md
        |  FROM dist d JOIN m ON d.vec_id = m.vec_id AND d.d6 = m.md
        |  GROUP BY 1)
        |SELECT cl, COUNT(*) AS n_assigned,
        |       ROUND(CAST(SUM(CAST(md AS DECIMAL(38,6))) AS DOUBLE), 4)
        |         AS inertia4
        |FROM assign GROUP BY cl
        |ORDER BY cl ASC NULLS FIRST""".stripMargin,

    // Exact-integer replay of the Spark pipeline (see the query's
    // scaladoc): HUGEINT plays DECIMAL(38,0)'s role. The exact→double
    // conversions go through VARCHAR: DuckDB's direct HUGEINT/DECIMAL→
    // DOUBLE casts mis-round some >2^53 integers by 1 ulp (probe:
    // 31321276294630700228), while its string parse — like Spark's
    // BigInteger.doubleValue — is correctly rounded.
    "q217_pca_power" ->
      """WITH flat AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1048576)
        |              AS BIGINT) AS xi
        |  FROM embeddings),
        |gram AS (
        |  SELECT a.dim AS i, b.dim AS j,
        |         CAST(SUM(CAST(a.xi * b.xi AS HUGEINT)) AS HUGEINT) AS sxy
        |  FROM flat a JOIN flat b ON a.vec_id = b.vec_id
        |  GROUP BY 1, 2),
        |mrg AS (
        |  SELECT dim AS k, CAST(SUM(xi) AS HUGEINT) AS sx, COUNT(*) AS n
        |  FROM flat GROUP BY 1),
        |cov AS (
        |  SELECT g.i, g.j,
        |         CAST(mi.n AS HUGEINT) * g.sxy - mi.sx * mj.sx AS aij
        |  FROM gram g JOIN mrg mi ON mi.k = g.i JOIN mrg mj ON mj.k = g.j),
        |w1 AS (SELECT i, SUM(aij * 1) AS w FROM cov GROUP BY i),
        |m1 AS (SELECT MAX(abs(w)) AS mw FROM w1),
        |r1 AS (SELECT i, CAST(CAST(w AS VARCHAR) AS DOUBLE)
        |              / CAST(CAST(mw AS VARCHAR) AS DOUBLE) AS r
        |       FROM w1 CROSS JOIN m1),
        |v1 AS (SELECT i, CAST(FLOOR(r * 1048576) AS BIGINT) AS v FROM r1),
        |w2 AS (SELECT cov.i, SUM(aij * CAST(v1.v AS HUGEINT)) AS w
        |       FROM cov JOIN v1 ON v1.i = cov.j GROUP BY 1),
        |m2 AS (SELECT MAX(abs(w)) AS mw FROM w2),
        |r2 AS (SELECT i, CAST(CAST(w AS VARCHAR) AS DOUBLE)
        |              / CAST(CAST(mw AS VARCHAR) AS DOUBLE) AS r
        |       FROM w2 CROSS JOIN m2),
        |v2 AS (SELECT i, CAST(FLOOR(r * 1048576) AS BIGINT) AS v FROM r2),
        |w3 AS (SELECT cov.i, SUM(aij * CAST(v2.v AS HUGEINT)) AS w
        |       FROM cov JOIN v2 ON v2.i = cov.j GROUP BY 1),
        |m3 AS (SELECT MAX(abs(w)) AS mw FROM w3),
        |r3 AS (SELECT i, CAST(CAST(w AS VARCHAR) AS DOUBLE)
        |              / CAST(CAST(mw AS VARCHAR) AS DOUBLE) AS r
        |       FROM w3 CROSS JOIN m3),
        |v3 AS (SELECT i, CAST(FLOOR(r * 1048576) AS BIGINT) AS v FROM r3),
        |num AS (
        |  SELECT SUM(cov.aij * CAST(vi.v AS HUGEINT)
        |             * CAST(vj.v AS HUGEINT)) AS num
        |  FROM cov JOIN v3 vi ON vi.i = cov.i JOIN v3 vj ON vj.i = cov.j),
        |den AS (SELECT SUM(CAST(v * v AS HUGEINT)) AS den FROM v3),
        |nn AS (SELECT MAX(n) AS n FROM mrg),
        |lam AS (
        |  SELECT CAST(CAST(num AS VARCHAR) AS DOUBLE)
        |         / CAST(CAST(den AS VARCHAR) AS DOUBLE)
        |         / CAST(n * (n - 1) AS DOUBLE)
        |         / 1048576.0 / 1048576.0 AS lambda1
        |  FROM num CROSS JOIN den CROSS JOIN nn)
        |SELECT CAST(r3.i AS BIGINT) AS dim, r3.r AS v3, lam.lambda1
        |FROM r3 CROSS JOIN lam
        |ORDER BY dim ASC NULLS FIRST""".stripMargin,

    // the 3 greedy MMR steps unrolled; the score rel − 0.5·sim over
    // 4dp-rounded cosines is mathematically a 5-decimal value, so the
    // ROUND(…, 5) sits on the grid in both engines
    "q220_mmr_rerank" -> {
      val slCos = Sql.cosine("pe", "embedding")
      val pairCos = Sql.cosine("ea.embedding", "eb.embedding")
      s"""WITH p AS (SELECT embedding AS pe FROM embeddings
         |           WHERE vec_id = 0),
         |sl AS (
         |  SELECT b.vec_id AS id, ROUND($slCos, 4) AS rel
         |  FROM embeddings b CROSS JOIN p
         |  WHERE b.vec_id != 0
         |  ORDER BY rel DESC NULLS LAST, id ASC LIMIT 10),
         |pr AS (
         |  SELECT a.id AS ia, b.id AS ib, ROUND($pairCos, 4) AS sim
         |  FROM sl a JOIN sl b ON a.id < b.id
         |  JOIN embeddings ea ON ea.vec_id = a.id
         |  JOIN embeddings eb ON eb.vec_id = b.id),
         |sim2 AS (SELECT ia, ib, sim FROM pr
         |         UNION ALL SELECT ib, ia, sim FROM pr),
         |s1 AS (SELECT id, rel AS score FROM sl
         |       ORDER BY rel DESC, id ASC LIMIT 1),
         |c2 AS (
         |  SELECT sl.id, sl.rel - 0.5 * s.sim AS score
         |  FROM sl JOIN sim2 s
         |    ON s.ia = sl.id AND s.ib = (SELECT id FROM s1)
         |  WHERE sl.id != (SELECT id FROM s1)),
         |s2 AS (SELECT id, score FROM c2
         |       ORDER BY score DESC, id ASC LIMIT 1),
         |c3 AS (
         |  SELECT sl.id, sl.rel - 0.5 * GREATEST(sa.sim, sb.sim) AS score
         |  FROM sl
         |  JOIN sim2 sa ON sa.ia = sl.id AND sa.ib = (SELECT id FROM s1)
         |  JOIN sim2 sb ON sb.ia = sl.id AND sb.ib = (SELECT id FROM s2)
         |  WHERE sl.id NOT IN (SELECT id FROM s1 UNION ALL
         |                      SELECT id FROM s2)),
         |s3 AS (SELECT id, score FROM c3
         |       ORDER BY score DESC, id ASC LIMIT 1)
         |SELECT CAST(1 AS BIGINT) AS rank, id, ROUND(score, 5) AS score5
         |FROM s1
         |UNION ALL SELECT 2, id, ROUND(score, 5) FROM s2
         |UNION ALL SELECT 3, id, ROUND(score, 5) FROM s3
         |ORDER BY rank ASC NULLS FIRST""".stripMargin
    },

    // the k-means replay: identical quantization, seed draw,
    // per-round assignment (dist asc, cl asc tie-break) and
    // sign-explicit truncating centroid means, unrolled one CTE
    // block per Lloyd round
    "q247_kmeans_steps" -> {
      val dim = 64
      val dist = s"CAST(list_sum(list_transform(range(1, ${dim + 1}), " +
        "i -> (e.e[i] - c.c[i]) * (e.e[i] - c.c[i]))) AS BIGINT)"
      def roundCtes(r: Int): String = {
        val upd = if (r < KmIters)
          s""",
             |g$r AS (
             |  SELECT a.cl, f.d, CAST(SUM(f.v) AS BIGINT) AS s,
             |         COUNT(*) AS n
             |  FROM a$r a JOIN f USING (vec_id) GROUP BY 1, 2),
             |cn$r AS (
             |  SELECT cl, list(CASE WHEN s < 0 THEN -((-s) // n)
             |                       ELSE s // n END ORDER BY d) AS c
             |  FROM g$r GROUP BY cl),
             |c${r + 1} AS (
             |  SELECT p.cl, COALESCE(n.c, p.c) AS c
             |  FROM c$r p LEFT JOIN cn$r n USING (cl))""".stripMargin
        else ""
        s"""d$r AS (
           |  SELECT e.vec_id, c.cl, $dist AS dist
           |  FROM e CROSS JOIN c$r c),
           |a$r AS (
           |  SELECT vec_id, cl, dist FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
           |      ORDER BY dist ASC, cl ASC) AS rn FROM d$r) z
           |  WHERE rn = 1),
           |t$r AS (
           |  SELECT CAST($r AS BIGINT) AS round, cl,
           |         COUNT(*) AS n_vecs, CAST(SUM(dist) AS BIGINT) AS inertia
           |  FROM a$r GROUP BY cl)$upd""".stripMargin
      }
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x ->
         |    CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         |  FROM embeddings),
         |f AS (
         |  SELECT vec_id, unnest(e) AS v, generate_subscripts(e, 1) AS d
         |  FROM e),
         |sd AS (
         |  SELECT vec_id, ROW_NUMBER() OVER (
         |    ORDER BY ${GraphQueries.polyMixSql(
              GraphQueries.pmodSql("vec_id"))} ASC,
         |             vec_id ASC) - 1 AS cl
         |  FROM e),
         |c1 AS (
         |  SELECT sd.cl, e.e AS c FROM sd JOIN e USING (vec_id)
         |  WHERE sd.cl < $KmK),
         |${(1 to KmIters).map(roundCtes).mkString(",\n")}
         |SELECT round, cl, n_vecs, inertia FROM (
         |  ${(1 to KmIters).map(r => s"SELECT * FROM t$r")
              .mkString(" UNION ALL ")}) u
         |ORDER BY round ASC NULLS FIRST, cl ASC NULLS FIRST""".stripMargin
    },

    // the per-subspace PQ training replay: identical quantization,
    // subvector slicing, shared seed draw, per-(vec, subspace)
    // assignment (dist asc, code asc tie-break) and sign-explicit
    // truncating centroid means, one CTE block per Lloyd round —
    // the q247 unroll with the subspace id threaded through every key
    "q267_pq_trace" ->
      s"""WITH ${pqTraceCteSql()}
         |SELECT round, j, code, n_vecs, inertia FROM (
         |  ${(1 to PqTrIters).map(r => s"SELECT * FROM t$r")
              .mkString(" UNION ALL ")}) u
         |ORDER BY round ASC NULLS FIRST, j ASC NULLS FIRST,
         |         code ASC NULLS FIRST""".stripMargin,

    // same trained model (the CTE prefix is SHARED with q267, so both
    // gate one pipeline), then the ADC stage: probe sub-distance
    // table against the final centroids, summed per (probe, vector)
    // through the final codes, ranked asc with id tie-break
    "q268_pq_adc_int" ->
      s"""WITH ${pqTraceCteSql()},
         |pe AS (SELECT vec_id AS probe_id, j, sv FROM sv
         |       WHERE vec_id < $PqTrProbes),
         |pd AS (
         |  SELECT pe.probe_id, pe.j, c.code,
         |         CAST(list_sum(list_transform(range(1, ${64 / PqTrM + 1}),
         |           i -> (pe.sv[i] - c.c[i]) * (pe.sv[i] - c.c[i])))
         |           AS BIGINT) AS pd
         |  FROM pe JOIN c$PqTrIters c ON pe.j = c.j),
         |adc AS (
         |  SELECT pd.probe_id, a.vec_id, CAST(SUM(pd.pd) AS BIGINT) AS adc
         |  FROM a$PqTrIters a JOIN pd ON pd.j = a.j AND pd.code = a.code
         |  WHERE a.vec_id != pd.probe_id
         |  GROUP BY 1, 2)
         |SELECT probe_id, vec_id, adc, rn FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |    ORDER BY adc ASC, vec_id ASC) AS rn FROM adc) z
         |WHERE rn <= $PqTrTopK
         |ORDER BY probe_id ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,

    // the q268 chain (shared prefix again) + the exact integer-L2
    // ranking over the same quantized vectors + the overlap count —
    // the recall table replayed end to end
    "q284_adc_recall" ->
      s"""WITH ${pqTraceCteSql()},
         |pe AS (SELECT vec_id AS probe_id, j, sv FROM sv
         |       WHERE vec_id < $PqTrProbes),
         |pd AS (
         |  SELECT pe.probe_id, pe.j, c.code,
         |         CAST(list_sum(list_transform(range(1, ${64 / PqTrM + 1}),
         |           i -> (pe.sv[i] - c.c[i]) * (pe.sv[i] - c.c[i])))
         |           AS BIGINT) AS pd
         |  FROM pe JOIN c$PqTrIters c ON pe.j = c.j),
         |adc AS (
         |  SELECT pd.probe_id, a.vec_id, CAST(SUM(pd.pd) AS BIGINT) AS adc
         |  FROM a$PqTrIters a JOIN pd ON pd.j = a.j AND pd.code = a.code
         |  WHERE a.vec_id != pd.probe_id
         |  GROUP BY 1, 2),
         |adcr AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY adc ASC, vec_id ASC) AS rn FROM adc) z
         |  WHERE rn <= $PqTrTopK),
         |exd AS (
         |  SELECT p.vec_id AS probe_id, o.vec_id,
         |         CAST(list_sum(list_transform(range(1, 65),
         |           i -> (p.e[i] - o.e[i]) * (p.e[i] - o.e[i])))
         |           AS BIGINT) AS d
         |  FROM e p JOIN e o ON p.vec_id < $PqTrProbes
         |                   AND o.vec_id != p.vec_id),
         |exr AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY d ASC, vec_id ASC) AS rn FROM exd) z
         |  WHERE rn <= $PqTrTopK),
         |ov AS (
         |  SELECT a.probe_id, COUNT(*) AS n_overlap
         |  FROM adcr a JOIN exr x ON x.probe_id = a.probe_id
         |                        AND x.vec_id = a.vec_id
         |  GROUP BY 1)
         |SELECT p.probe_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
         |       COALESCE(ov.n_overlap, 0) * 1000 // $PqTrTopK
         |         AS recall_permille
         |FROM (SELECT vec_id AS probe_id FROM e
         |      WHERE vec_id < $PqTrProbes) p
         |LEFT JOIN ov ON ov.probe_id = p.probe_id
         |ORDER BY p.probe_id ASC NULLS FIRST""".stripMargin,

    // the q284 replay at the production layout, with q132's two-stage
    // search inserted between ADC and the overlap: shortlist 32 by
    // summed sub-distances, exact integer re-rank to top-3, ground
    // truth the exact integer-L2 top-3 — one parameterized CTE
    // generator serves both geometries
    "q285_adc_recall_prod" ->
      s"""WITH ${pqTraceCteSql(PqPrM, PqPrK, PqPrIters)},
         |pe AS (SELECT vec_id AS probe_id, j, sv FROM sv
         |       WHERE vec_id < $PqPrProbes),
         |pd AS (
         |  SELECT pe.probe_id, pe.j, c.code,
         |         CAST(list_sum(list_transform(range(1, ${64 / PqPrM + 1}),
         |           i -> (pe.sv[i] - c.c[i]) * (pe.sv[i] - c.c[i])))
         |           AS BIGINT) AS pd
         |  FROM pe JOIN c$PqPrIters c ON pe.j = c.j),
         |adc AS (
         |  SELECT pd.probe_id, a.vec_id, CAST(SUM(pd.pd) AS BIGINT) AS adc
         |  FROM a$PqPrIters a JOIN pd ON pd.j = a.j AND pd.code = a.code
         |  WHERE a.vec_id != pd.probe_id
         |  GROUP BY 1, 2),
         |shortl AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY adc ASC, vec_id ASC) AS rn FROM adc) z
         |  WHERE rn <= $PqPrShortK),
         |rrd AS (
         |  SELECT sl.probe_id, sl.vec_id,
         |         CAST(list_sum(list_transform(range(1, 65),
         |           i -> (p.e[i] - o.e[i]) * (p.e[i] - o.e[i])))
         |           AS BIGINT) AS d
         |  FROM shortl sl
         |  JOIN e p ON p.vec_id = sl.probe_id
         |  JOIN e o ON o.vec_id = sl.vec_id),
         |rtop AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY d ASC, vec_id ASC) AS rn FROM rrd) z
         |  WHERE rn <= $PqPrTopK),
         |exd AS (
         |  SELECT p.vec_id AS probe_id, o.vec_id,
         |         CAST(list_sum(list_transform(range(1, 65),
         |           i -> (p.e[i] - o.e[i]) * (p.e[i] - o.e[i])))
         |           AS BIGINT) AS d
         |  FROM e p JOIN e o ON p.vec_id < $PqPrProbes
         |                   AND o.vec_id != p.vec_id),
         |exr AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY d ASC, vec_id ASC) AS rn FROM exd) z
         |  WHERE rn <= $PqPrTopK),
         |ov AS (
         |  SELECT r.probe_id, COUNT(*) AS n_overlap
         |  FROM rtop r JOIN exr x ON x.probe_id = r.probe_id
         |                        AND x.vec_id = r.vec_id
         |  GROUP BY 1)
         |SELECT p.probe_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
         |       COALESCE(ov.n_overlap, 0) * 1000 // $PqPrTopK
         |         AS recall_permille
         |FROM (SELECT vec_id AS probe_id FROM e
         |      WHERE vec_id < $PqPrProbes) p
         |LEFT JOIN ov ON ov.probe_id = p.probe_id
         |ORDER BY p.probe_id ASC NULLS FIRST""".stripMargin,

    // the health replay: the shared q267 training CTE's final-round
    // census, same entropy quantization, same truncating share
    "q341_pq_code_health" ->
      codeHealthSql(PqTrM, PqTrK, PqTrIters),

    // the same milli-quantization, one pair CTE carrying all four
    // prefix distances (list-prefix folds), per-width ROW_NUMBER
    // mirrors of the bounded heap, semi-join overlaps vs the full
    // width, the same truncating permille
    "q366_matryoshka_recall" -> {
      val dcols = MrlDims.map { w =>
        s"CAST(list_sum(list_transform(range(1, ${w + 1}), " +
          s"i -> (p.e[i] - o.e[i]) * (p.e[i] - o.e[i]))) " +
          s"AS BIGINT) AS d_$w"
      }.mkString(",\n         ")
      val wf = MrlDims.last
      val perW = MrlDims.map { w =>
        s"""rk$w AS (
           |  SELECT probe_id, id FROM (
           |    SELECT probe_id, id, ROW_NUMBER() OVER (
           |      PARTITION BY probe_id
           |      ORDER BY d_$w ASC, id ASC) AS rn FROM pd) z
           |  WHERE rn <= $MrlK)""".stripMargin
      }.mkString(",\n")
      val rows = MrlDims.map { w =>
        s"""SELECT CAST($w AS INT) AS dims, np.n_probes,
           |       np.n_probes * $MrlK AS n_true, ov$w.n_overlap,
           |       CAST(1000 * ov$w.n_overlap // (np.n_probes * $MrlK)
           |         AS BIGINT) AS recall_pm
           |FROM ov$w CROSS JOIN np""".stripMargin
      }.mkString("\nUNION ALL\n")
      val ovs = MrlDims.map { w =>
        s"""ov$w AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap
           |  FROM rk$w a JOIN rk$wf f
           |    ON f.probe_id = a.probe_id AND f.id = a.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |         list_transform(embedding, x ->
         |           CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |pd AS (
         |  SELECT p.vec_id AS probe_id, o.vec_id AS id,
         |         $dcols
         |  FROM e p JOIN e o ON p.vec_id < $MrlProbes
         |                   AND o.vec_id != p.vec_id),
         |$perW,
         |$ovs,
         |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes
         |       FROM e WHERE vec_id < $MrlProbes)
         |$rows
         |ORDER BY dims ASC NULLS FIRST""".stripMargin
    },

    // same generator at the production geometry — the q285 convention
    // (one parameterized CTE generator per family) so the two
    // code-health gates cannot drift apart
    "q359_pq_code_health_prod" ->
      codeHealthSql(PqPrM, PqPrK, PqPrIters)
  )

  /** q341/q359's shared oracle: the parameterized training replay
    * ([[pqTraceCteSql]]) followed by the final-round health readout. */
  private def codeHealthSql(m: Int, k: Int, iters: Int): String =
    s"""WITH ${pqTraceCteSql(m, k, iters)},
       |cells AS (
       |  SELECT j, code, n_vecs, inertia,
       |         SUM(n_vecs) OVER (PARTITION BY j) AS n
       |  FROM t$iters),
       |per AS (
       |  SELECT j, COUNT(*) AS n_used,
       |         CAST(MAX(n) AS BIGINT) AS n_assigned,
       |         CAST(MAX(n_vecs) AS BIGINT) AS max_code,
       |         CAST(SUM(inertia) AS BIGINT) AS inertia,
       |         SUM(CAST(ROUND(-(CAST(n_vecs AS DOUBLE)
       |           / CAST(n AS DOUBLE))
       |           * ln(CAST(n_vecs AS DOUBLE) / CAST(n AS DOUBLE)), 6)
       |           AS DECIMAL(38,6))) AS hd
       |  FROM cells GROUP BY 1)
       |SELECT j, CAST(n_used AS BIGINT) AS n_used,
       |       CAST($k - n_used AS BIGINT) AS n_dead,
       |       n_assigned,
       |       CAST(1000 * max_code // n_assigned AS BIGINT)
       |         AS top_share_pm,
       |       ROUND(CAST(hd AS DOUBLE), 6) AS h6, inertia
       |FROM per
       |ORDER BY j ASC NULLS FIRST""".stripMargin

  /** q267/q268/q284/q285's shared oracle prefix: quantize → slice into
    * `m` subvectors → seed draw → `iters` unrolled Lloyd rounds, every
    * CTE keyed on (vec_id, j) / (j, code) so ONE block trains all
    * subspaces — ends with the final codebooks `c$iters`, the final
    * assignment `a$iters` and the per-round traces `t*`. Parameterized
    * over the layout: the q267 trace keys replay the small (4×8×3)
    * geometry, q285 the q132 production (16×16×4) one — same SQL
    * generator, so the two gates cannot drift apart. */
  private def pqTraceCteSql(m: Int = PqTrM, k: Int = PqTrK,
    iters: Int = PqTrIters): String = {
    val sub = 64 / m
    val dist = s"CAST(list_sum(list_transform(range(1, ${sub + 1}), " +
      "i -> (sv.sv[i] - c.c[i]) * (sv.sv[i] - c.c[i]))) AS BIGINT)"
    def roundCtes(r: Int): String = {
      val upd = if (r < iters)
        s""",
           |g$r AS (
           |  SELECT a.j, a.code, f.d, CAST(SUM(f.v) AS BIGINT) AS s,
           |         COUNT(*) AS n
           |  FROM a$r a JOIN f ON f.vec_id = a.vec_id AND f.j = a.j
           |  GROUP BY 1, 2, 3),
           |cn$r AS (
           |  SELECT j, code, list(CASE WHEN s < 0 THEN -((-s) // n)
           |                       ELSE s // n END ORDER BY d) AS c
           |  FROM g$r GROUP BY j, code),
           |c${r + 1} AS (
           |  SELECT p.j, p.code, COALESCE(n.c, p.c) AS c
           |  FROM c$r p LEFT JOIN cn$r n
           |    ON n.j = p.j AND n.code = p.code)""".stripMargin
      else ""
      s"""d$r AS (
         |  SELECT sv.vec_id, sv.j, c.code, $dist AS dist
         |  FROM sv JOIN c$r c ON sv.j = c.j),
         |a$r AS (
         |  SELECT vec_id, j, code, dist FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j
         |      ORDER BY dist ASC, code ASC) AS rn FROM d$r) z
         |  WHERE rn = 1),
         |t$r AS (
         |  SELECT CAST($r AS BIGINT) AS round, j, code,
         |         COUNT(*) AS n_vecs, CAST(SUM(dist) AS BIGINT) AS inertia
         |  FROM a$r GROUP BY j, code)$upd""".stripMargin
    }
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x ->
       |    CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
       |  FROM embeddings),
       |sv AS (
       |  SELECT vec_id, CAST(t.j AS INT) AS j,
       |         list_slice(e, t.j * $sub + 1, t.j * $sub + $sub) AS sv
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $m)) AS j) t),
       |f AS (
       |  SELECT vec_id, j, unnest(sv) AS v,
       |         generate_subscripts(sv, 1) AS d
       |  FROM sv),
       |sd AS (
       |  SELECT vec_id, ROW_NUMBER() OVER (
       |    ORDER BY ${GraphQueries.polyMixSql(
              GraphQueries.pmodSql("vec_id"))} ASC,
       |             vec_id ASC) - 1 AS cl
       |  FROM e),
       |c1 AS (
       |  SELECT sv.j, CAST(sd.cl AS INT) AS code, sv.sv AS c
       |  FROM sd JOIN sv USING (vec_id)
       |  WHERE sd.cl < $k),
       |${(1 to iters).map(roundCtes).mkString(",\n")}""".stripMargin
  }
}
