package graft.operators

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.3 joins q10–q16 (q17–q19 live in TemporalJoinQueries).
  *
  * Scale notes: dimension tables (region/nation, and customer vs a much
  * larger fact) are explicitly `broadcast()` so the star joins never
  * shuffle the fact side; the orders⋈lineitem join is a plain equi-join on
  * the natural key so Spark picks shuffle-hash/sort-merge and AQE can
  * re-plan from runtime stats. No collect-to-driver anywhere.
  */
object JoinQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** q373's grid geometry: 30° cells in integer micro-degrees —
    * coarse enough that a 3×3 ring holds candidates even at the
    * fixtures' supplier counts; the cell size is the only tuning knob
    * at real density. Declared before the oracle map interpolates. */
  private val GeoCellU = 30000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Grid-blocked nearest-supplier spatial join — the SPATIAL family's
    // scale shape (public geohash/grid-blocking method): synthetic but
    // deterministic coordinates (seeded polyMix of the keys, exact
    // integer MICRO-DEGREES [D1] — the fixtures ship no geo columns,
    // so the op carries its own, like the COPY/multimodal gates), 30°
    // grid cells, each customer equi-joins suppliers in its 3×3
    // neighbor ring (longitude wraps, latitude clamps by absence) and
    // keeps the nearest by EXACT integer squared equirectangular
    // distance through the bounded-heap top-1 ([D3] — no float sort
    // key, no haversine needed for ranking). THIS is the spatial scale
    // path: candidates via cell equi-join (shuffle/broadcast on the
    // cell key), never a cross join — at 100 TB both sides
    // hash-partition by cell and the ring explode is a constant ×9.
    // Customers whose ring is empty at fixture density keep a row with
    // found = 0 (NULL supplier), not a dropped row. Correctness caveat
    // of grid-blocked kNN (r13 advice): when the ring is NON-empty the
    // reported nearest_supp is nearest-WITHIN-RING — a customer whose
    // true global nearest sits outside the 3×3 ring reports the closer
    // in-ring supplier instead (standard grid-blocking approximation;
    // shrinking GeoCellU raises precision, growing it raises recall of
    // the empty-ring case).
    "q373_geo_grid_knn" -> ((s, dir) => {
      val hm = GraphQueries.HashM
      def latu(k: org.apache.spark.sql.Column) =
        pmod(GraphQueries.polyMix(pmod(k, lit(hm))),
          lit(180000000L)) - 90000000L
      def lonu(k: org.apache.spark.sql.Column) =
        pmod(GraphQueries.polyMix(pmod(k * 2 + 1, lit(hm))),
          lit(360000000L)) - 180000000L
      val cust = t(s, dir, "customer").select(col("c_custkey"),
          latu(col("c_custkey")).as("clat"),
          lonu(col("c_custkey")).as("clon"))
        .withColumn("cy", expr(s"(clat + 90000000L) div $GeoCellU"))
        .withColumn("cx", expr(s"(clon + 180000000L) div $GeoCellU"))
      val supp = t(s, dir, "supplier").select(col("s_suppkey"),
          latu(col("s_suppkey")).as("slat"),
          lonu(col("s_suppkey")).as("slon"))
        .withColumn("sy", expr(s"(slat + 90000000L) div $GeoCellU"))
        .withColumn("sx", expr(s"(slon + 180000000L) div $GeoCellU"))
      val ring = cust
        .select(col("c_custkey"), col("clat"), col("clon"),
          col("cx"), col("cy"),
          explode(sequence(lit(0), lit(8))).as("o"))
        .withColumn("cxn", pmod(col("cx") + (col("o") % 3) - 1, lit(12L)))
        .withColumn("cyn", col("cy") + expr("o div 3") - 1)
      // wrapped longitude delta: a candidate reached through the ±180°
      // seam must be scored by the short way around, or the wrap join
      // would find it and the metric would then reject it
      val dlon = least(abs(col("clon") - col("slon")),
        lit(360000000L) - abs(col("clon") - col("slon")))
      val cand = ring.join(broadcast(supp),
          col("cxn") === col("sx") && col("cyn") === col("sy"))
        .select(col("c_custkey"), col("s_suppkey"),
          ((col("clat") - col("slat")) * (col("clat") - col("slat"))
            + dlon * dlon).as("d2"))
      val best = graft.plans.GraftOps.topKPerGroup(cand,
        Seq(col("c_custkey")), Seq(col("d2").asc, col("s_suppkey").asc), 1)
        .select(col("c_custkey"), col("s_suppkey"), col("d2"))
      cust.select("c_custkey").join(best, Seq("c_custkey"), "left")
        .select(col("c_custkey"),
          col("s_suppkey").isNotNull.cast("int").as("found"),
          col("s_suppkey").as("nearest_supp"), col("d2"))
        .orderBy("c_custkey")
    }),

    "q10_join_bcast_dims" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"), decSumD(col("c_acctbal")).as("sum_bal"))
        .orderBy("r_name")),

    "q11_join_sortmerge" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          decSumD(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("o_orderpriority")),

    "q12_join_left" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(decSumD(col("o_totalprice")), lit(0d))
            .as("sum_price"))
        .orderBy("c_custkey")),

    "q13_join_full" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      val sup = t(s, dir, "supplier").groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, c("c_nationkey") === sup("s_nationkey"), "full")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),

    "q14_join_semi" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "q15_join_anti" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "q16_join_cross" -> ((s, dir) =>
      t(s, dir, "region").select("r_name")
        .crossJoin(t(s, dir, "orders").select("o_orderstatus").distinct())
        .orderBy("r_name", "o_orderstatus")),

    // Fuzzy string matching: near-duplicate part names by Levenshtein ≤ 2
    // within a (brand, length-band) block. Brand alone is NOT a bounded
    // blocking key — |block| grows linearly with the corpus, so Σ|block|²
    // within a brand is quadratic at 100×. The composite key adds
    // band = len div 4: since |len(a) − len(b)| ≤ 2 < 4 implies the two
    // bands differ by at most 1, the b side replicates to bands
    // {band−1, band, band+1} and the equi-join on (brand, band) with
    // a's UNIQUE band catches every qualifying pair exactly once — the
    // same output as brand-only blocking (the oracle is algorithm-
    // independent) at 3× build-side rows but Σ|block|² bounded by the
    // rows per (brand, 4-length-window). The cheap length prefilter
    // (a lower bound on edit distance) still prunes before the O(len²)
    // Levenshtein kernel, and the distance materializes ONCE — a
    // levenshtein in both the filter and the projection would run the
    // kernel twice per pair (no CSE across them).
    "q141_name_editdist" -> ((s, dir) => {
      val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_name")
      val band = floor(length(col("p_name")) / EditBandWidth).cast("int")
      val a = p.select(col("p_brand"), band.as("band"),
        col("p_partkey").as("id_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand"),
          explode(array(band - 1, band, band + 1)).as("band"),
          col("p_partkey").as("id_b"), col("p_name").as("name_b"))
      a.join(b, Seq("p_brand", "band"))
        .filter(col("id_a") < col("id_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= 2)
        // counting filter first: ed >= max(chars) - common multiset
        // bytes, an O(|a|+|b|) bound that discards most pairs before
        // any DP runs (the q205 prefilter pattern; conservative for
        // any UTF-8 input since common bytes >= common chars)
        .filter(greatest(length(col("name_a")), length(col("name_b")))
          - expr("graft_common_bytes(name_a, name_b)") <= 2)
        // then the 3-arg threshold form: banded O(d·n) DP returning -1
        // past the cap instead of filling the full O(n·m) matrix —
        // kept rows carry the exact distance, so the output (and
        // oracle) are unchanged
        .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
        .filter(col("dist") >= 0)
        .select(col("p_brand"), col("id_a"), col("id_b"), col("dist"))
        .orderBy("p_brand", "id_a", "id_b")
    }),

    // Null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — the join
    // flavor where NULL keys MATCH each other instead of vanishing: a
    // fifth of each side's keys are nulled (nullif on key mod 5), and
    // the null bucket must pair up. Spark plans `<=>` as a normal
    // hash-join key (null-safe equi-key, broadcast here) — not the
    // cartesian + filter a naive `OR (a IS NULL AND b IS NULL)`
    // predicate would force.
    "q197_nullsafe_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"),
          nullif(col("c_nationkey") % 5, lit(2)).as("k"))
      val supp = t(s, dir, "supplier")
        .groupBy(nullif(col("s_nationkey") % 5, lit(2)).as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      cust.join(broadcast(supp), col("k") <=> col("sk"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_cust"), max(col("n_supp")).as("n_supp"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // Jaro–Winkler fuzzy matching — q141's edit-distance sibling on the
    // record-linkage scorer (prefix-boosted, length-normalized). Spark
    // has no built-in, so the kernel is the graft_jaro_winkler codegen
    // Expression (functions/TextExpressions.scala) gated against
    // DuckDB's jaro_winkler_similarity — same blocked (brand,
    // length-band) candidate generation as q141 (JW ≥ 0.94 on 30-char
    // names implies near-equal lengths, so the ±1-band replication
    // loses nothing at this threshold), similarity materialized once,
    // 4dp-rounded with the filter on the rounded value so the
    // boundary set is identical in both engines.
    "q205_jaro_winkler" -> ((s, dir) =>
      jwPairs(s, dir)
        .select(col("p_brand"), col("id_a"), col("id_b"), col("jw4"))
        .orderBy("p_brand", "id_a", "id_b")),

    // Entity-resolution clustering — the composition that makes fuzzy
    // matching a MERGE verb: the q205 JW match pairs become edges and
    // connected components assigns every part a cluster id + a keeper
    // flag (min-id representative), exactly the q77 resolution loop on
    // a different similarity relation. The oracle is the algorithm-
    // independent recursive-CTE transitive closure.
    "q215_linkage_cluster" -> ((s, dir) =>
      graft.api.DedupOps.clusterResolve(
        t(s, dir, "part"), "p_partkey",
        jwPairs(s, dir).select(col("id_a").as("id_lo"),
          col("id_b").as("id_hi")))
        .orderBy("p_partkey")),

    // Golden-record survivorship — the MERGE that makes entity
    // resolution useful: q205 matches, q215 clusters, this emits ONE
    // canonical record per multi-member cluster under deterministic
    // per-field survivorship rules (longest name with min-id
    // tie-break, lexicographic-min brand, max size, min price, modal
    // type with lexicographic tie-break). Scale shape: after the
    // cluster labels (frontier-sized CC iterations, shared via the
    // memoized pair table), survivorship is two keyed map-side-
    // combinable aggs + one modal argmax through the bounded heap —
    // nothing ever revisits the pair relation.
    "q269_golden_record" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val cl = graft.api.DedupOps.clusterResolve(part, "p_partkey",
        jwPairs(s, dir).select(col("id_a").as("id_lo"),
          col("id_b").as("id_hi")))
        .select("p_partkey", "cluster_id")
      val m = part.join(cl, "p_partkey")
      val base = m.groupBy("cluster_id").agg(
        count(lit(1)).as("n_members"),
        min(struct((-length(col("p_name"))).as("nl"),
          col("p_partkey").as("id"), col("p_name").as("nm")))
          .getField("nm").as("name_survivor"),
        min("p_brand").as("brand_min"),
        max("p_size").as("size_max"),
        min("p_retailprice").as("price_min"))
      val modal = m.groupBy("cluster_id", "p_type")
        .agg(count(lit(1)).as("c"))
        .groupBy("cluster_id")
        .agg(min(struct((-col("c")).as("nc"), col("p_type").as("t")))
          .getField("t").as("type_modal"))
      base.join(modal, "cluster_id")
        .filter(col("n_members") >= 2)
        .select("cluster_id", "n_members", "name_survivor", "brand_min",
          "size_max", "price_min", "type_modal")
        .orderBy("cluster_id")
    })
  )

  /** q205/q215's blocked Jaro–Winkler match pairs: (brand, length-band)
    * blocking with ±1-band replication (see q141's bound argument),
    * similarity materialized once, threshold on the 4dp-rounded value.
    * Memoized per (session, dir) — q205 and q215 share one evaluation
    * of the 8 M-pair kernel scan instead of paying it each
    * (the TextQueries pair-table convention). */
  private[graft] def jwPairs(s: SparkSession, dir: String): DataFrame =
    graft.Caches.memo(s, s"join.jwpairs:$dir")(jwPairsBuild(s, dir))

  private def jwPairsBuild(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_name")
    val band = floor(length(col("p_name")) / EditBandWidth).cast("int")
    val a = p.select(col("p_brand"), band.as("band"),
      col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"),
      explode(array(band - 1, band, band + 1)).as("band"),
      col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "band"))
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= 2)
      // the score-floored kernel: pairs the O(|a|+|b|) common-byte
      // bound proves sub-floor (~98% here, measured) skip the
      // quadratic match loop and surface as 0.0 — sound because the
      // raw-value filter right below discards everything sub-floor
      // anyway. 0.9399 is strictly below every double that HALF_UP-
      // rounds to >= 0.94, so the final ROUNDED filter (unchanged)
      // still decides the boundary set; rounding only the ~2% of
      // surviving pairs also keeps Spark's BigDecimal-backed Round
      // (~1.3 s over 7 M pairs, measured) off the hot path.
      .withColumn("jw",
        expr(s"graft_jaro_winkler_gte(name_a, name_b, " +
          s"${JwThreshold - 1e-4}D)"))
      .filter(col("jw") >= JwThreshold - 1e-4)
      .withColumn("jw4", round(col("jw"), 4))
      .filter(col("jw4") >= JwThreshold)
      .drop("jw")
  }

  /** q205's match floor on the 4dp-rounded similarity. */
  private val JwThreshold = 0.94

  /** q141's length-band width — must exceed the edit-distance cap (2)
    * so a qualifying pair's bands differ by at most 1. */
  private val EditBandWidth = 4

  val oracle: Map[String, String] = Map(
    // the same seeded micro-degree coordinates, 30° cells, ×9 ring
    // (lon wrap via the pmod form), exact integer d², ROW_NUMBER top-1
    "q373_geo_grid_knn" -> {
      import GraphQueries.{pmodSql, polyMixSql}
      def latu(k: String) =
        s"((${polyMixSql(pmodSql(k))}) % 180000000) - 90000000"
      def lonu(k: String) =
        s"((${polyMixSql(pmodSql(s"($k) * 2 + 1"))}) % 360000000) " +
          "- 180000000"
      s"""WITH cust AS (
         |  SELECT c_custkey, ${latu("c_custkey")} AS clat,
         |         ${lonu("c_custkey")} AS clon
         |  FROM customer),
         |cc AS (
         |  SELECT c_custkey, clat, clon,
         |         (clat + 90000000) // $GeoCellU AS cy,
         |         (clon + 180000000) // $GeoCellU AS cx
         |  FROM cust),
         |supp AS (
         |  SELECT s_suppkey, ${latu("s_suppkey")} AS slat,
         |         ${lonu("s_suppkey")} AS slon
         |  FROM supplier),
         |ss AS (
         |  SELECT s_suppkey, slat, slon,
         |         (slat + 90000000) // $GeoCellU AS sy,
         |         (slon + 180000000) // $GeoCellU AS sx
         |  FROM supp),
         |ring AS (
         |  SELECT cc.*, ((cx + (o % 3) - 1) % 12 + 12) % 12 AS cxn,
         |         cy + (o // 3) - 1 AS cyn
         |  FROM cc CROSS JOIN (SELECT unnest(range(0, 9)) AS o) os),
         |cand AS (
         |  SELECT r.c_custkey, s.s_suppkey,
         |         (r.clat - s.slat) * (r.clat - s.slat)
         |           + least(abs(r.clon - s.slon),
         |                   360000000 - abs(r.clon - s.slon))
         |             * least(abs(r.clon - s.slon),
         |                     360000000 - abs(r.clon - s.slon)) AS d2
         |  FROM ring r JOIN ss s ON r.cxn = s.sx AND r.cyn = s.sy),
         |best AS (
         |  SELECT c_custkey, s_suppkey, CAST(d2 AS BIGINT) AS d2 FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
         |      ORDER BY d2 ASC, s_suppkey ASC) AS rn FROM cand) z
         |  WHERE rn = 1)
         |SELECT cc.c_custkey,
         |       CAST(CASE WHEN best.s_suppkey IS NULL THEN 0 ELSE 1 END
         |         AS INTEGER) AS found,
         |       best.s_suppkey AS nearest_supp, best.d2
         |FROM cc LEFT JOIN best USING (c_custkey)
         |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin
    },
    "q141_name_editdist" ->
      """SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM part a JOIN part b ON a.p_brand = b.p_brand
        |WHERE a.p_partkey < b.p_partkey
        |  AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a.p_brand ASC NULLS FIRST, id_a ASC NULLS FIRST,
        |         id_b ASC NULLS FIRST""".stripMargin,

    "q10_join_bcast_dims" ->
      """SELECT r_name, COUNT(*) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name ASC NULLS FIRST""".stripMargin,

    "q11_join_sortmerge" ->
      """SELECT o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lines
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q12_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE),
        |                0.0) AS sum_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "q13_join_full" ->
      """SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
        |       COALESCE(c.n_cust, 0) AS n_cust,
        |       COALESCE(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
        |  ON c.c_nationkey = s.s_nationkey
        |ORDER BY nationkey ASC NULLS FIRST""".stripMargin,

    "q14_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "q15_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "q16_join_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) o
        |ORDER BY r_name ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q205_jaro_winkler" ->
      """SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
        |       ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw4
        |FROM part a JOIN part b ON a.p_brand = b.p_brand
        |WHERE a.p_partkey < b.p_partkey
        |  AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.94
        |ORDER BY a.p_brand ASC NULLS FIRST, id_a ASC NULLS FIRST,
        |         id_b ASC NULLS FIRST""".stripMargin,

    "q215_linkage_cluster" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.p_partkey AS id_lo, b.p_partkey AS id_hi
        |  FROM part a JOIN part b ON a.p_brand = b.p_brand
        |  WHERE a.p_partkey < b.p_partkey
        |    AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |    AND ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 4)
        |        >= 0.94),
        |ed AS (SELECT id_lo AS src, id_hi AS dst FROM e
        |       UNION SELECT id_hi, id_lo FROM e),
        |reach(node, lab) AS (
        |  SELECT p_partkey, p_partkey FROM part
        |  UNION
        |  SELECT ed.dst, r.lab FROM reach r JOIN ed ON ed.src = r.node)
        |SELECT node AS p_partkey, MIN(lab) AS cluster_id,
        |       CAST(CASE WHEN MIN(lab) = node THEN 1 ELSE 0 END AS INT)
        |         AS keep
        |FROM reach GROUP BY node
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    // same recursive closure as q215 (both gate one resolution), then
    // the survivorship rules as windows/aggs over the merged view
    "q269_golden_record" ->
      """WITH RECURSIVE e AS (
        |  SELECT a.p_partkey AS id_lo, b.p_partkey AS id_hi
        |  FROM part a JOIN part b ON a.p_brand = b.p_brand
        |  WHERE a.p_partkey < b.p_partkey
        |    AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |    AND ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 4)
        |        >= 0.94),
        |ed AS (SELECT id_lo AS src, id_hi AS dst FROM e
        |       UNION SELECT id_hi, id_lo FROM e),
        |reach(node, lab) AS (
        |  SELECT p_partkey, p_partkey FROM part
        |  UNION
        |  SELECT ed.dst, r.lab FROM reach r JOIN ed ON ed.src = r.node),
        |cl AS (SELECT node AS p_partkey, MIN(lab) AS cluster_id
        |       FROM reach GROUP BY node),
        |m AS (SELECT p.*, cl.cluster_id FROM part p JOIN cl USING (p_partkey)),
        |base AS (
        |  SELECT cluster_id, COUNT(*) AS n_members,
        |         MIN(p_brand) AS brand_min,
        |         MAX(p_size) AS size_max,
        |         MIN(p_retailprice) AS price_min
        |  FROM m GROUP BY 1),
        |nm AS (
        |  SELECT cluster_id, p_name AS name_survivor FROM (
        |    SELECT cluster_id, p_name, ROW_NUMBER() OVER (
        |      PARTITION BY cluster_id
        |      ORDER BY length(p_name) DESC, p_partkey ASC) AS rn FROM m) z
        |  WHERE rn = 1),
        |tm AS (
        |  SELECT cluster_id, p_type AS type_modal FROM (
        |    SELECT cluster_id, p_type, ROW_NUMBER() OVER (
        |      PARTITION BY cluster_id
        |      ORDER BY COUNT(*) DESC, p_type ASC) AS rn
        |    FROM m GROUP BY cluster_id, p_type) z
        |  WHERE rn = 1)
        |SELECT b.cluster_id, b.n_members, nm.name_survivor, b.brand_min,
        |       b.size_max, b.price_min, tm.type_modal
        |FROM base b JOIN nm USING (cluster_id) JOIN tm USING (cluster_id)
        |WHERE b.n_members >= 2
        |ORDER BY cluster_id ASC NULLS FIRST""".stripMargin,

    "q197_nullsafe_join" ->
      """WITH cust AS (
        |  SELECT c_custkey, NULLIF(c_nationkey % 5, 2) AS k FROM customer),
        |supp AS (
        |  SELECT NULLIF(s_nationkey % 5, 2) AS sk, COUNT(*) AS n_supp
        |  FROM supplier GROUP BY 1)
        |SELECT k, COUNT(*) AS n_cust, MAX(n_supp) AS n_supp
        |FROM cust JOIN supp ON k IS NOT DISTINCT FROM sk
        |GROUP BY k
        |ORDER BY k ASC NULLS FIRST""".stripMargin
  )
}
