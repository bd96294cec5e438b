package graft.operators

import graft.{Dets, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.4 aggregations q20–q27.
  *
  * Scale notes: all aggregates are algebraic (sum/count/min/max over
  * decimal) so Spark's HashAggregate runs a map-side partial pass before
  * the shuffle — the reduce side only sees one row per (group × partition).
  * DECIMAL(38,6) sums are exact and associative, so partial aggregation is
  * safe at any partition count (the [D2] rule is also the 1000-executor
  * correctness rule). `collect_list` is always wrapped in `array_sort`
  * because collect order is partition-dependent.
  */
object AggQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_agg_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          decSumD(col("l_quantity")).as("sum_qty"),
          decSumD(col("l_extendedprice")).as("sum_base_price"),
          decSumD(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          decSumD(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("sum_charge"),
          decAvg(col("l_quantity")).as("avg_qty"),
          decAvg(col("l_extendedprice")).as("avg_price"),
          decAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q21_agg_distinct" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_ord"))
        .orderBy("o_orderstatus")),

    // Oracle-omitted (SURVEY §2.4): HLL estimate has no exact SQL analog;
    // bounds vs the exact count are asserted in AggSpec.
    "q22_agg_hll" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))),

    // DSL note: rollup-after-join trips Spark's ambiguous-self-join check
    // (Expand duplicates the grouping attrs); the SQL front-end resolves it
    // cleanly and also exercises the parser entry point.
    "q23_rollup" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("graft_customer")
      t(s, dir, "nation").createOrReplaceTempView("graft_nation")
      t(s, dir, "region").createOrReplaceTempView("graft_region")
      s.sql(
        """SELECT r_name, n_name, COUNT(*) AS n_cust
          |FROM graft_customer
          |JOIN graft_nation ON c_nationkey = n_nationkey
          |JOIN graft_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    }),

    "q24_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(decSumD(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Hierarchy DERIVED from a string: p_type's three tokens
    // (category/finish/material) become a rollup dimension — the
    // "parse-then-rollup" reporting shape. SQL front-end like q23 (the
    // rollup-after-join Expand trips the DSL's ambiguous-self-join
    // check); split_part is 1-based with identical semantics in both
    // engines, the revenue is the exact decimal sum, and part
    // broadcasts against the fact scan.
    "q150_type_hierarchy" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
      t(s, dir, "part").createOrReplaceTempView("graft_part")
      s.sql(
        """SELECT split_part(p_type, ' ', 1) AS category,
          |       split_part(p_type, ' ', 2) AS finish,
          |       split_part(p_type, ' ', 3) AS material,
          |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
          |                     AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
          |       COUNT(*) AS n_lines
          |FROM graft_lineitem
          |JOIN graft_part ON l_partkey = p_partkey
          |GROUP BY ROLLUP (category, finish, material)
          |ORDER BY category ASC NULLS FIRST, finish ASC NULLS FIRST,
          |         material ASC NULLS FIRST""".stripMargin)
    }),

    "q25_grouping_sets" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_returnflag"), col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSumD(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q26_agg_filtered" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          sum(when(col("event_type") === "purchase", col("value")).cast(Dec))
            .cast("double").as("purchase_value"),
          count(when(col("event_type") === "purchase", lit(1))).as("n_purchase"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")),

    // Emitted as a comma-joined string (integers render identically in
    // both engines) so the driver's value hash sees a scalar, not an
    // engine-specific array representation.
    "q27_collect_sorted" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000)
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(array_sort(collect_list(col("o_orderkey"))).as("ids_arr"))
        .select(col("c_mktsegment"),
          expr("array_join(transform(ids_arr, x -> CAST(x AS STRING)), ',')")
            .as("order_ids"))
        .orderBy("c_mktsegment")),

    // LISTAGG — Redshift's delimiter-joined within-group string agg:
    // nations per region, alphabetical. collect_list is UNORDERED in a
    // distributed agg, so the sort happens explicitly on the collected
    // array (array_sort) before the join — the [D1] convention that
    // makes the string partition-layout-invariant. Group size is
    // schema-bounded (nations per region), the one shape where a
    // collected list is scale-safe.
    "q181_listagg" -> ((s, dir) =>
      t(s, dir, "region")
        .join(t(s, dir, "nation"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_nations"),
          array_join(array_sort(collect_list(col("n_name"))), ",")
            .as("nations"))
        .orderBy("r_name")),

    // Bitwise aggregation (Redshift BIT_OR/BIT_AND family): per event
    // type, the presence/intersection/parity masks of props.k mod 8.
    // Bit ops are exact integer arithmetic — commutative, associative,
    // partition-order-free by construction; one map-side-combinable
    // hash agg.
    "q182_bitmask" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          expr("cast(shiftleft(1, cast(cast(get_json_object(props, '$.k')" +
            " as bigint) % 8 as int)) as bigint)").as("m"))
        .groupBy("event_type")
        .agg(expr("bit_or(m)").as("mask"),
          expr("bit_and(m)").as("and_mask"),
          expr("bit_xor(m)").as("xor_mask"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // ROLLUP with GROUPING() indicator columns — the disambiguation a
    // reporting layer needs when a group value is legitimately NULL vs
    // the rollup's subtotal NULL. grouping() flags cast to BIGINT on
    // both engines; the sort leads with the flags so subtotal rows
    // land deterministically.
    "q188_grouping_id" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"),
          decSumD(col("l_quantity")).as("sum_qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("g_flag"),
          col("g_status"), col("n"), col("sum_qty"))
        .orderBy(col("g_flag").asc, col("g_status").asc,
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // Geometric and harmonic means — the remaining Pythagorean means
    // (rate/ratio averaging verbs). Both are sums of float-derived
    // per-row terms, so each term quantizes to 6dp BEFORE the decimal
    // sum ([D2]/[D3] — the q48-entropy convention that makes the
    // reassociation-sensitive double sum exact and order-free).
    // geo = exp(avg(ln x)); harm = n / Σ(1/x), computed as n·1e6 over
    // the 6dp-quantized Σ(1e6/x) so the per-row reciprocals of
    // ~1e5-scale prices keep ~7 significant digits through the quantize.
    "q200_gen_means" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_lines"),
          round(exp(decSum(round(log(col("l_extendedprice")), 6))
            .cast("double") / count(lit(1))), 4).as("geo_mean"),
          round(count(lit(1)) * lit(1000000.0) /
            decSum(round(lit(1000000.0) / col("l_extendedprice"), 6))
              .cast("double"), 4).as("harm_mean"))
        .orderBy("l_returnflag")),

    // The same 3-group skewed rollup as a SALTED two-phase aggregation —
    // functions/Skew.saltedAgg gated under the oracle (SkewSpec asserts
    // the plan shape; this asserts the VALUES). 3 groups over the whole
    // fact table is the shape where a plain hash agg's reduce side
    // collapses to 3 tasks at 100 TB; the salt fans phase 1 to
    // 3×8 cells and phase 2 re-folds 24 exact decimal partials. The
    // orderkey discriminator keeps the salt deterministic ([D1]).
    "q209_salted_agg" -> ((s, dir) =>
      graft.functions.Skew.saltedAgg(
        t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice",
          "l_quantity", "l_orderkey"),
        Seq("l_returnflag"), 8,
        Map("sum_price" -> col("l_extendedprice"),
          "sum_qty" -> col("l_quantity")),
        Some(col("l_orderkey")))
        .select(col("l_returnflag"), col("n"),
          col("sum_price").cast("double").as("sum_price"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy("l_returnflag")),

    // Hash-partition skew diagnostic — the pre-flight a 100 TB job
    // reads before picking a shuffle key: simulate the P-way hash
    // partitioning for a candidate key and report per-partition load
    // (rows, distinct keys, imbalance vs the uniform share). Two keys
    // side by side: the high-cardinality l_orderkey (≈ uniform,
    // imbalance ~1) vs the 3-value l_returnflag (3 partitions carry
    // everything — imbalance ~10x, the q209 salting motivation made
    // measurable). The partition function is the house polyMix on the
    // reduced key (strings via charHash), so the diagnostic itself is
    // engine-portable; cost = one map-side-combinable agg per key.
    // Empty partitions emit no row (their absence IS the skew signal).
    "q271_partition_skew" -> ((s, dir) => {
      val p = 32
      val li = t(s, dir, "lineitem")
      def pt(reduced: org.apache.spark.sql.Column) =
        pmod(graft.operators.GraphQueries.polyMix(reduced), lit(p)).as("pt")
      val byOrder = li.select(lit("l_orderkey").as("key_name"),
        pt(pmod(col("l_orderkey"), lit(graft.operators.GraphQueries.HashM))),
        col("l_orderkey").cast("string").as("k"))
      val byFlag = li.select(lit("l_returnflag").as("key_name"),
        pt(expr(TextFunctions.charHash("l_returnflag"))),
        col("l_returnflag").as("k"))
      val per = byOrder.unionByName(byFlag)
        .groupBy("key_name", "pt")
        .agg(count(lit(1)).as("n_rows"), countDistinct("k").as("n_keys"))
      val tot = per.groupBy("key_name").agg(sum("n_rows").as("total"))
      per.join(broadcast(tot), "key_name")
        .select(col("key_name"), col("pt"), col("n_rows"), col("n_keys"),
          round((col("n_rows") * p).cast("double") / col("total"), 4)
            .as("imb4"))
        .orderBy("key_name", "pt")
    }),

    // MAX_BY / MIN_BY (Redshift/DuckDB arg_max/arg_min) — the argmax
    // verb. The ordering value packs (balance cents, custkey) into one
    // BIGINT so it is UNIQUE per row: argmax over a tied raw balance is
    // engine-nondeterministic, the packed key makes both engines pick
    // the same customer without a window.
    "q212_argmax" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          (round(col("c_acctbal") * 100).cast("long") * 10000000L
            + col("c_custkey")).as("v"))
        .groupBy("c_mktsegment")
        .agg(max_by(col("c_custkey"), col("v")).as("richest_cust"),
          min_by(col("c_custkey"), col("v")).as("poorest_cust"),
          count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment"))
  )

  val oracle: Map[String, String] = Map(
    "q20_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q21_agg_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_ord
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q23_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q24_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q150_type_hierarchy" ->
      """SELECT split_part(p_type, ' ', 1) AS category,
        |       split_part(p_type, ' ', 2) AS finish,
        |       split_part(p_type, ' ', 3) AS material,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY ROLLUP (category, finish, material)
        |ORDER BY category ASC NULLS FIRST, finish ASC NULLS FIRST,
        |         material ASC NULLS FIRST""".stripMargin,

    "q25_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty, COUNT(*) AS n,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_status
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q26_agg_filtered" ->
      """SELECT user_id,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(38,6))) AS DOUBLE) AS purchase_value,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    "q27_collect_sorted" ->
      """SELECT c_mktsegment,
        |       array_to_string(list_sort(list(o_orderkey)), ',') AS order_ids
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 400000
        |GROUP BY c_mktsegment ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin,

    "q181_listagg" ->
      """SELECT r.r_name, COUNT(*) AS n_nations,
        |       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1 ORDER BY r.r_name ASC NULLS FIRST""".stripMargin,

    "q182_bitmask" ->
      """WITH m AS (
        |  SELECT event_type,
        |    CAST(1 << CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
        |                   % 8 AS INTEGER) AS BIGINT) AS m
        |  FROM events)
        |SELECT event_type,
        |       CAST(bit_or(m) AS BIGINT) AS mask,
        |       CAST(bit_and(m) AS BIGINT) AS and_mask,
        |       CAST(bit_xor(m) AS BIGINT) AS xor_mask,
        |       COUNT(*) AS n
        |FROM m GROUP BY 1 ORDER BY event_type ASC NULLS FIRST""".stripMargin,

    "q188_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag ASC, g_status ASC,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q200_gen_means" ->
      """SELECT l_returnflag, COUNT(*) AS n_lines,
        |  ROUND(EXP(CAST(SUM(CAST(ROUND(LN(l_extendedprice), 6)
        |    AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)), 4) AS geo_mean,
        |  ROUND(COUNT(*) * 1000000.0 /
        |    CAST(SUM(CAST(ROUND(1000000.0 / l_extendedprice, 6)
        |      AS DECIMAL(38,6))) AS DOUBLE), 4) AS harm_mean
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "q209_salted_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
        |    AS sum_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    // same polyMix partition function (strings via charHash), same
    // per-key load agg
    "q271_partition_skew" ->
      s"""WITH o AS (
         |  SELECT 'l_orderkey' AS key_name,
         |         (${GraphQueries.polyMixSql(
              GraphQueries.pmodSql("l_orderkey"))}) % 32 AS pt,
         |         CAST(l_orderkey AS VARCHAR) AS k
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'l_returnflag',
         |         (${GraphQueries.polyMixSql(
              graft.functions.TextFunctions.Sql.charHash("l_returnflag"))})
         |           % 32,
         |         l_returnflag
         |  FROM lineitem),
         |per AS (
         |  SELECT key_name, pt, COUNT(*) AS n_rows,
         |         CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys
         |  FROM o GROUP BY 1, 2),
         |tot AS (SELECT key_name, CAST(SUM(n_rows) AS BIGINT) AS total
         |        FROM per GROUP BY 1)
         |SELECT p.key_name, p.pt, p.n_rows, p.n_keys,
         |       ROUND(CAST(p.n_rows * 32 AS DOUBLE) / t.total, 4) AS imb4
         |FROM per p JOIN tot t USING (key_name)
         |ORDER BY key_name ASC NULLS FIRST, pt ASC NULLS FIRST"""
        .stripMargin,

    "q212_argmax" ->
      """WITH v AS (
        |  SELECT c_mktsegment, c_custkey,
        |    CAST(ROUND(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey
        |      AS v
        |  FROM customer)
        |SELECT c_mktsegment,
        |       arg_max(c_custkey, v) AS richest_cust,
        |       arg_min(c_custkey, v) AS poorest_cust,
        |       COUNT(*) AS n_cust
        |FROM v GROUP BY c_mktsegment
        |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin
  )
}
