package graft.operators

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PIVOT/UNPIVOT (q28/q29) — Redshift analytics-SQL surface.
  *
  * Oracles use the portable CASE-aggregation / UNION ALL formulations so
  * dialect-specific PIVOT syntax differences can't drift. Pivot values
  * are pinned explicitly (never inferred from data — inference costs an
  * extra scan and is nondeterministic under concurrent writes).
  */
object PivotQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy("o_orderpriority")),

    "q29_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(decSumD(col("l_extendedprice")).as("price"),
          decSumD(col("l_quantity")).as("qty"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("price"), col("qty")), "measure", "value")
        .orderBy("l_returnflag", "measure"))
  )

  val oracle: Map[String, String] = Map(
    "q28_pivot" ->
      """SELECT o_orderpriority,
        |       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        |       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        |       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q29_unpivot" ->
      """WITH g AS (
        |  SELECT l_returnflag,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS price,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'price' AS measure, price AS value FROM g
        |UNION ALL
        |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM g
        |ORDER BY l_returnflag ASC NULLS FIRST, measure ASC NULLS FIRST""".stripMargin
  )
}
