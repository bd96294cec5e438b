package graft.operators

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.6 sorts/limits/top-k + §2.7 set operations.
  *
  * Scale notes: the global top-k compiles to `TakeOrderedAndProject`
  * (per-partition heap + driver merge of k rows — no global sort, no full
  * shuffle). Set ops are hash-partitioned distinct/anti forms that
  * partial-aggregate map-side.
  */
object SortSetQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_topk_global" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    "q37_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(lit("c").as("side"), col("c_nationkey").as("nationkey"))
      val sup = t(s, dir, "supplier")
        .select(lit("s").as("side"), col("s_nationkey").as("nationkey"))
      c.unionByName(sup)
        .groupBy("side", "nationkey")
        .agg(count(lit(1)).as("n"))
        .orderBy("side", "nationkey")
    }),

    "q38_intersect" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(
          t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    "q39_except" -> ((s, dir) =>
      t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nationkey"))
        .except(
          t(s, dir, "supplier").filter(col("s_acctbal") > 9000)
            .select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // 2-D skyline (Pareto frontier): parts no other part dominates —
    // cheaper-or-equal AND bigger-or-equal with one strict. The naive
    // form is an O(n²) dominance anti-join (the oracle spells exactly
    // that); the engine runs the sweep instead: collapse to the
    // per-price max size (map-side-combinable hash agg — distinct
    // prices, not rows, cross the exchange), take the STRICT-prefix
    // running max over the price domain with the distributed bucket
    // scheme (GlobalRank.prefixMax — no single-task global window),
    // and keep a part iff it carries its price's max size and beats
    // every strictly-cheaper price's best. One scan + one
    // domain-bounded sweep at any corpus size.
    "q143_skyline" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_retailprice").isNotNull && col("p_size").isNotNull)
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
      val per = p.groupBy("p_retailprice")
        .agg(max(col("p_size")).as("smax"))
        // the sweep is global — one constant group; parallelism comes
        // from the price-domain buckets, not the group key
        .withColumn("__g1", lit(1))
      val swept = graft.functions.GlobalRank.prefixMax(
        per, groupCol = "__g1", orderCol = "p_retailprice",
        valueCol = "smax").drop("__g1")
      p.join(swept, Seq("p_retailprice"))
        .filter(col("p_size") === col("smax") &&
          (col("pmax").isNull || col("pmax") < col("p_size")))
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    }),

    // Bag (multiset) set operations — INTERSECT ALL / EXCEPT ALL keep
    // multiplicities where q38/q39's distinct forms collapse them:
    // |A ∩all B| = Σ min(multA, multB), |A −all B| = Σ max(0,
    // multA − multB). Spark's intersectAll/exceptAll compile to the
    // count-compare hash aggregation (one shuffle per side, no
    // row-pairing join); the five one-row counts attach by broadcast.
    "q187_bag_ops" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k"))
      val b = li.filter(col("l_linestatus") === "F")
        .select(col("l_orderkey").as("k"))
      a.agg(count(lit(1)).as("n_a"))
        .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
        .crossJoin(broadcast(
          a.intersectAll(b).agg(count(lit(1)).as("n_inter_all"))))
        .crossJoin(broadcast(
          a.exceptAll(b).agg(count(lit(1)).as("n_except_all"))))
        .crossJoin(broadcast(
          a.intersect(b).agg(count(lit(1)).as("n_inter_dist"))))
    }),

    // UNION by NAME with schema widening — the lake-append verb for
    // heterogeneous generations: the two legs share (id, amount, src)
    // but in different column ORDER, and `prio` exists only on the
    // orders leg. unionByName(allowMissingColumns = true) aligns by
    // name and null-fills — positional UNION ALL would silently pair
    // amount with id. Gated through a per-src rollup (counts + exact
    // sums + null accounting on the widened column).
    "q198_union_byname" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(
        col("o_orderkey").as("id"),
        col("o_totalprice").as("amount"),
        lit("order").as("src"),
        col("o_orderpriority").as("prio"))
      val b = t(s, dir, "lineitem").select(
        lit("line").as("src"),
        col("l_extendedprice").as("amount"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
      a.unionByName(b, allowMissingColumns = true)
        .groupBy("src")
        .agg(count(lit(1)).as("n_rows"),
          decSumD(col("amount")).as("sum_amount"),
          count(col("prio")).as("n_prio"),
          count(col("id")).as("n_id"))
        .orderBy("src")
    })
  )

  val oracle: Map[String, String] = Map(
    "q36_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
        |LIMIT 10""".stripMargin,

    "q37_union" ->
      """SELECT side, nationkey, COUNT(*) AS n FROM (
        |  SELECT 'c' AS side, c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT 's' AS side, s_nationkey AS nationkey FROM supplier) u
        |GROUP BY side, nationkey
        |ORDER BY side ASC NULLS FIRST, nationkey ASC NULLS FIRST""".stripMargin,

    "q38_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey ASC NULLS FIRST""".stripMargin,

    "q39_except" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
        |ORDER BY nationkey ASC NULLS FIRST""".stripMargin,

    // algorithm-independent dominance definition — the quadratic
    // NOT EXISTS anti-join the engine's sweep must reproduce exactly
    "q143_skyline" ->
      """SELECT a.p_partkey, a.p_name, a.p_retailprice, a.p_size
        |FROM part a
        |WHERE a.p_retailprice IS NOT NULL AND a.p_size IS NOT NULL
        |  AND NOT EXISTS (
        |    SELECT 1 FROM part b
        |    WHERE b.p_retailprice IS NOT NULL AND b.p_size IS NOT NULL
        |      AND b.p_retailprice <= a.p_retailprice
        |      AND b.p_size >= a.p_size
        |      AND (b.p_retailprice < a.p_retailprice
        |           OR b.p_size > a.p_size))
        |ORDER BY a.p_partkey ASC NULLS FIRST""".stripMargin,

    "q187_bag_ops" ->
      """WITH a AS (
        |  SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'),
        |b AS (
        |  SELECT l_orderkey AS k FROM lineitem WHERE l_linestatus = 'F')
        |SELECT
        |  (SELECT COUNT(*) FROM a) AS n_a,
        |  (SELECT COUNT(*) FROM b) AS n_b,
        |  (SELECT COUNT(*) FROM
        |    (SELECT k FROM a INTERSECT ALL SELECT k FROM b)) AS n_inter_all,
        |  (SELECT COUNT(*) FROM
        |    (SELECT k FROM a EXCEPT ALL SELECT k FROM b)) AS n_except_all,
        |  (SELECT COUNT(*) FROM
        |    (SELECT k FROM a INTERSECT SELECT k FROM b)) AS n_inter_dist""".stripMargin,

    "q198_union_byname" ->
      """WITH u AS (
        |  (SELECT o_orderkey AS id, o_totalprice AS amount,
        |          'order' AS src, o_orderpriority AS prio
        |   FROM orders)
        |  UNION ALL BY NAME
        |  (SELECT 'line' AS src, l_extendedprice AS amount,
        |          l_orderkey * 10 + l_linenumber AS id
        |   FROM lineitem))
        |SELECT src, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(amount AS DECIMAL(38,6))) AS DOUBLE)
        |         AS sum_amount,
        |       COUNT(prio) AS n_prio, COUNT(id) AS n_id
        |FROM u GROUP BY src
        |ORDER BY src ASC NULLS FIRST""".stripMargin
  )
}
