package graft.operators

import graft.Tables
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
        .orderBy("nationkey"))
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
        |ORDER BY nationkey ASC NULLS FIRST""".stripMargin
  )
}
