package graft.operators

import java.sql.Timestamp

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated bindings of the [[graft.api.EtlService]] endpoints — the
  * parameterized-query surface runs under the same DuckDB hash gate as
  * every other operator, with the endpoint parameters pinned to
  * representative values (a year-long date range, one market segment).
  */
object ServiceQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** UTC-pinned bounds: Timestamp.valueOf would parse in the JVM default
    * zone and silently shift the range boundary (vs the oracle's naive
    * TIMESTAMP literals) on a non-UTC machine. build.sbt pins
    * -Duser.timezone=UTC too; this makes the binding safe even without
    * the flag (e.g. a user's own launcher). */
  private def utcTs(s: String): Timestamp =
    Timestamp.from(java.time.LocalDateTime.parse(s)
      .toInstant(java.time.ZoneOffset.UTC))

  private val From = utcTs("1995-01-01T00:00:00")
  private val Until = utcTs("1996-01-01T00:00:00")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Date-range revenue endpoint, narrowed to one market segment: the
    // range binds on the orders scan (PushedFilters), the segment dim
    // broadcasts, and the month rollup uses the exact decimal sum.
    "q84_svc_revenue" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.revenueByOrderDate(t(s, dir, "orders"), t(s, dir, "lineitem"),
        From, Until, segment = Some("BUILDING"),
        customer = Some(t(s, dir, "customer")))
        .select(Dets.tsOut(col("month")).as("month"),
          col("revenue"), col("n_orders"))
        .orderBy("month")
    }),

    // Dimension-parameter endpoint: per-nation account health for one
    // region, dims broadcast, decimal-exact sums/averages.
    "q85_svc_nation" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.nationSummary(t(s, dir, "customer"), t(s, dir, "nation"),
        t(s, dir, "region"), regionName = Some("ASIA"))
        .orderBy("region", "nation")
    })
  )

  val oracle: Map[String, String] = Map(
    "q84_svc_revenue" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY 1
        |ORDER BY month ASC NULLS FIRST""".stripMargin,

    "q85_svc_nation" ->
      """SELECT n_name AS nation, r_name AS region,
        |  COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal,
        |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 4) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY n_name, r_name
        |ORDER BY region ASC NULLS FIRST, nation ASC NULLS FIRST""".stripMargin
  )
}
