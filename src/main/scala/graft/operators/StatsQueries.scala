package graft.operators

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical aggregates (q43–q44), the Redshift analytics-SQL family
  * the reference pushes down (STDDEV/VARIANCE/CORR/PERCENTILE).
  *
  * Determinism design: Spark's native stddev/corr accumulate doubles in
  * partition order — low bits drift with partitioning, which would break
  * both the oracle hash and cluster determinism. Instead the moments
  * (Σx, Σx², Σxy) are exact DECIMAL(38,6) sums (x ≤ 2dp so x², xy ≤ 4dp
  * are exact), and variance/correlation are derived in one fixed double
  * formula — bit-identical at any partition count and in DuckDB.
  * Median uses explicit percentile_disc semantics (rank-based, no
  * interpolation-formula drift between engines).
  */
object StatsQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_moment_stats" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val g = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        decSum(col("l_quantity")).cast("double").as("sx"),
        decSum(col("l_quantity") * col("l_quantity")).cast("double").as("sx2"),
        decSum(col("l_extendedprice")).cast("double").as("sy"),
        decSum(col("l_extendedprice") * col("l_extendedprice")).cast("double")
          .as("sy2"),
        decSum(col("l_quantity") * col("l_extendedprice")).cast("double")
          .as("sxy"))
      // safeDiv guards: a single-row group (n-1 = 0) or a zero-variance
      // group (corr denominator 0) yields NULL, matching DuckDB's x/0.
      g.select(col("l_returnflag"), col("n"),
          round(col("sx") / col("n"), 4).as("mean_qty"),
          round(safeDiv(col("sx2") - col("sx") * col("sx") / col("n"),
            col("n") - 1), 4).as("var_qty"),
          round(sqrt(safeDiv(col("sx2") - col("sx") * col("sx") / col("n"),
            col("n") - 1)), 4).as("std_qty"),
          round(safeDiv(col("sxy") - col("sx") * col("sy") / col("n"),
            sqrt((col("sx2") - col("sx") * col("sx") / col("n")) *
              (col("sy2") - col("sy") * col("sy") / col("n")))), 4)
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // Approximate quantiles (GK sketch via percentile_approx) — the
    // single-pass, mergeable path for 100 TB where the exact rank form
    // (q44) would need a full sort per group. Oracle-omitted like q22:
    // sketch merge order isn't cross-engine reproducible; StatsSpec
    // bound-checks it against the exact percentiles instead.
    "q45_approx_quantile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("p25"),
          col("qs").getItem(1).as("p50"),
          col("qs").getItem(2).as("p75"))
        .orderBy("l_returnflag")),

    // percentile_disc median without the per-group single-task window
    // sort the oracle SQL spells: the ((n+1) div 2)-th row ordered by
    // (price, key) carries the smallest price whose value-histogram
    // cumulative count reaches (n+1) div 2 — the tie-break never changes
    // the picked PRICE — so the median runs over distinct values with a
    // range-partitioned cumulative sum (GlobalRank.cumSum), parallel in
    // the partition count instead of the group count.
    "q44_median_disc" -> ((s, dir) => {
      val hist = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_totalprice"))
        .agg(count(lit(1)).as("cnt"))
      graft.functions.GlobalRank
        .cumSum(hist, "o_orderstatus", "o_totalprice", "cnt")
        .groupBy("o_orderstatus")
        .agg(min(when(col("cum") >= expr("(n + 1) div 2"),
          col("o_totalprice"))).as("median_price"))
        .orderBy("o_orderstatus")
    }),

    // percentile_cont(0.5) median — q44's interpolating sibling: the
    // continuous median is the mean of the ((n+1) div 2)-th and
    // (n div 2 + 1)-th ordered values (equal when n is odd), each
    // picked from the same distributed value histogram + cumulative
    // count — still no per-group sort, and the one interpolation is a
    // single IEEE add+halve, bit-identical on both engines.
    "q140_median_cont" -> ((s, dir) => {
      val hist = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_totalprice"))
        .agg(count(lit(1)).as("cnt"))
      graft.functions.GlobalRank
        .cumSum(hist, "o_orderstatus", "o_totalprice", "cnt")
        .groupBy("o_orderstatus")
        .agg(
          min(when(col("cum") >= expr("(n + 1) div 2"),
            col("o_totalprice"))).as("v_lo"),
          min(when(col("cum") >= expr("n div 2 + 1"),
            col("o_totalprice"))).as("v_hi"))
        .select(col("o_orderstatus"),
          ((col("v_lo") + col("v_hi")) / 2).as("median_cont"))
        .orderBy("o_orderstatus")
    }),

    // Median absolute deviation — the robust dispersion statistic
    // (outlier-immune where q43's stddev is not): per status, the
    // percentile_disc median of |price − median(price)|. Both medians
    // run through the q44 machinery (value histogram + distributed
    // cumulative count — no per-group sort at any scale); the 3-row
    // median table broadcasts back, and the deviation is one IEEE
    // subtraction on identical operands in both engines, so the
    // deviation HISTOGRAM keys match bit-exactly.
    "q144_mad" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def discMedian(df: DataFrame, grp: String, v: String,
        out: String): DataFrame = {
        val hist = df.groupBy(col(grp), col(v)).agg(count(lit(1)).as("cnt"))
        graft.functions.GlobalRank.cumSum(hist, grp, v, "cnt")
          .groupBy(grp)
          .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col(v)))
            .as(out))
      }
      val med = discMedian(o, "o_orderstatus", "o_totalprice",
        "median_price")
      val dev = o.join(broadcast(med), Seq("o_orderstatus"))
        .select(col("o_orderstatus"),
          abs(col("o_totalprice") - col("median_price")).as("d"))
      discMedian(dev, "o_orderstatus", "d", "mad")
        .join(broadcast(med), Seq("o_orderstatus"))
        .select("o_orderstatus", "median_price", "mad")
        .orderBy("o_orderstatus")
    }),

    // Benford first-digit audit — the classic numeric-integrity screen
    // over a financial column: distribution of leading digits of
    // o_totalprice. The digit extracts through DECIMAL(18,2) → string
    // (both engines render a plain fixed-point literal — no float
    // formatting drift, no log10 edge cases at power-of-ten
    // boundaries); one 9-group map-side-combinable count plus a
    // broadcast one-row total.
    "q147_benford" -> ((s, dir) => {
      val d = t(s, dir, "orders")
        .filter(col("o_totalprice") >= 1)
        .select(substring(col("o_totalprice").cast("decimal(18,2)")
          .cast("string"), 1, 1).cast("int").as("digit"))
      d.groupBy("digit").agg(count(lit(1)).as("n_orders"))
        .crossJoin(broadcast(d.agg(count(lit(1)).as("__total"))))
        .select(col("digit"), col("n_orders"),
          round(col("n_orders") / col("__total"), 4).as("share4"))
        .orderBy("digit")
    }),

    // Quantity-WEIGHTED median price — the weighted-percentile verb
    // (each price weighted by units shipped). Same distributed
    // histogram + cumulative machinery as q44, with the count weight
    // replaced by the exact decimal quantity sum; the pick is the
    // smallest price whose cumulative weight reaches half the total
    // (2·cum ≥ n in exact decimals — no division).
    "q151_weighted_median" -> ((s, dir) => {
      val hist = t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(decSum(col("l_quantity")).as("wt"))
      graft.functions.GlobalRank
        .cumSum(hist, "l_returnflag", "l_extendedprice", "wt")
        .groupBy("l_returnflag")
        .agg(min(when(col("cum") * 2 >= col("n"), col("l_extendedprice")))
          .as("wmedian_price"))
        .orderBy("l_returnflag")
    }),

    // EXACT distributed-histogram quartiles: value-level histogram (a
    // map-side-combinable hash agg — rows collapse to distinct values
    // before any shuffle), a range-partitioned global cumulative count
    // over the value domain (GlobalRank.cumSum — parallel in the
    // partition count, not the 3 return flags), then the smallest value
    // whose cumulative count reaches ceil(k·n/4), selected with three
    // conditional mins in ONE pass (no quartile cross join) and
    // unpivoted. Deterministic and oracle-able where the q45 sketch is
    // not; integer threshold arithmetic ((n·k+3) div 4) is exact on
    // both engines.
    "q46_quantile_hist" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val hist = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
      graft.functions.GlobalRank
        .cumSum(hist, "l_returnflag", "l_extendedprice", "cnt")
        .groupBy("l_returnflag")
        .agg(
          min(when(col("cum") >= expr("(n * 1 + 3) div 4"),
            col("l_extendedprice"))).as("q1"),
          min(when(col("cum") >= expr("(n * 2 + 3) div 4"),
            col("l_extendedprice"))).as("q2"),
          min(when(col("cum") >= expr("(n * 3 + 3) div 4"),
            col("l_extendedprice"))).as("q3"))
        .selectExpr("l_returnflag",
          "stack(3, 1, q1, 2, q2, 3, q3) AS (quartile, val)")
        .orderBy("l_returnflag", "quartile")
    })
  )

  val oracle: Map[String, String] = Map(
    "q43_moment_stats" ->
      """WITH g AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy2,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |       ROUND(sx / n, 4) AS mean_qty,
        |       -- + 0 on the sign-indeterminate outputs normalizes a
        |       -- possible -0.0 (Spark's BigDecimal round never emits it)
        |       ROUND((sx2 - sx * sx / n) / (n - 1), 4) + 0 AS var_qty,
        |       ROUND(SQRT((sx2 - sx * sx / n) / (n - 1)), 4) AS std_qty,
        |       ROUND((sxy - sx * sy / n)
        |             / SQRT((sx2 - sx * sx / n) * (sy2 - sy * sy / n)), 4)
        |         + 0 AS corr_qty_price
        |FROM g ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "q46_quantile_hist" ->
      """WITH hist AS (
        |  SELECT l_returnflag, l_extendedprice, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2
        |), cum AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         SUM(cnt) OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        |  FROM hist
        |), qs(quartile) AS (VALUES (1), (2), (3))
        |SELECT l_returnflag, quartile, MIN(l_extendedprice) AS val
        |FROM cum CROSS JOIN qs
        |WHERE cum >= (n * quartile + 3) // 4
        |GROUP BY l_returnflag, quartile
        |ORDER BY l_returnflag ASC NULLS FIRST, quartile ASC NULLS FIRST""".stripMargin,

    "q140_median_cont" ->
      """WITH hist AS (
        |  SELECT o_orderstatus, o_totalprice, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2
        |), cum AS (
        |  SELECT o_orderstatus, o_totalprice,
        |         SUM(cnt) OVER (PARTITION BY o_orderstatus
        |           ORDER BY o_totalprice ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(cnt) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM hist)
        |SELECT o_orderstatus,
        |  (MIN(CASE WHEN cum >= (n + 1) // 2 THEN o_totalprice END)
        |   + MIN(CASE WHEN cum >= n // 2 + 1 THEN o_totalprice END)) / 2
        |    AS median_cont
        |FROM cum GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q44_median_disc" ->
      """SELECT o_orderstatus, o_totalprice AS median_price FROM (
        |  SELECT o_orderstatus, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |           ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey ASC NULLS FIRST) AS rn,
        |         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM orders) x
        |WHERE rn = (n + 1) // 2
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    // both medians replayed with the q44 row_number form; the deviation
    // is the same double subtraction on the same operands
    "q144_mad" ->
      """WITH med AS (
        |  SELECT o_orderstatus, o_totalprice AS median_price FROM (
        |    SELECT o_orderstatus, o_totalprice,
        |           ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice ASC NULLS FIRST,
        |                      o_orderkey ASC NULLS FIRST) AS rn,
        |           COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        |    FROM orders) x
        |  WHERE rn = (n + 1) // 2),
        |dev AS (
        |  SELECT o.o_orderstatus, m.median_price,
        |         ABS(o.o_totalprice - m.median_price) AS d, o.o_orderkey
        |  FROM orders o JOIN med m ON o.o_orderstatus = m.o_orderstatus)
        |SELECT o_orderstatus, median_price, d AS mad FROM (
        |  SELECT o_orderstatus, median_price, d,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |           ORDER BY d ASC NULLS FIRST,
        |                    o_orderkey ASC NULLS FIRST) AS rn,
        |         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM dev) x
        |WHERE rn = (n + 1) // 2
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q151_weighted_median" ->
      """WITH hist AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         SUM(CAST(l_quantity AS DECIMAL(38,6))) AS wt
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         SUM(wt) OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(wt) OVER (PARTITION BY l_returnflag) AS n
        |  FROM hist)
        |SELECT l_returnflag,
        |       MIN(CASE WHEN cum * 2 >= n THEN l_extendedprice END)
        |         AS wmedian_price
        |FROM cum GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "q147_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |                          AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders WHERE o_totalprice >= 1),
        |c AS (SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY 1),
        |t AS (SELECT COUNT(*) AS total FROM d)
        |SELECT digit, n_orders,
        |       ROUND(CAST(n_orders AS DOUBLE) / total, 4) AS share4
        |FROM c CROSS JOIN t
        |ORDER BY digit ASC NULLS FIRST""".stripMargin
  )
}
