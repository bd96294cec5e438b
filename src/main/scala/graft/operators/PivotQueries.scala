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
        .orderBy("l_returnflag", "measure")),

    // Multi-measure PIVOT — two aggregates per pivot cell (line count
    // AND exact revenue sum per return flag). Spark names the columns
    // <value>_<aggAlias>; the aliases are pinned so the oracle's CASE
    // aggregation emits the identical header. One hash aggregate, no
    // extra scan per measure.
    "q199_pivot_multi" -> ((s, dir) => {
      val p = t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)).as("n"),
          decSumD(col("l_extendedprice")).as("rev"))
      // pivot aggregates pre-grouped partials with `first`, so an EMPTY
      // (l_linestatus, l_returnflag) cell yields NULL — but the
      // oracle's COUNT(CASE ...) yields 0. Coalesce the count columns
      // so the agreement holds at ANY fixture scale, not just one where
      // every cell happens to be populated. (The SUM columns stay as-is:
      // SQL SUM over an empty cell is NULL on both engines.)
      Seq("A_n", "N_n", "R_n")
        .foldLeft(p)((df, c) =>
          df.withColumn(c, coalesce(col(c), lit(0L))))
        .orderBy("l_linestatus")
    })
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
        |ORDER BY l_returnflag ASC NULLS FIRST, measure ASC NULLS FIRST""".stripMargin,

    "q199_pivot_multi" ->
      """SELECT l_linestatus,
        |  COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS "A_n",
        |  CAST(SUM(CASE WHEN l_returnflag = 'A'
        |    THEN CAST(l_extendedprice AS DECIMAL(38,6)) END) AS DOUBLE)
        |    AS "A_rev",
        |  COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS "N_n",
        |  CAST(SUM(CASE WHEN l_returnflag = 'N'
        |    THEN CAST(l_extendedprice AS DECIMAL(38,6)) END) AS DOUBLE)
        |    AS "N_rev",
        |  COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS "R_n",
        |  CAST(SUM(CASE WHEN l_returnflag = 'R'
        |    THEN CAST(l_extendedprice AS DECIMAL(38,6)) END) AS DOUBLE)
        |    AS "R_rev"
        |FROM lineitem GROUP BY l_linestatus
        |ORDER BY l_linestatus ASC NULLS FIRST""".stripMargin
  )
}
