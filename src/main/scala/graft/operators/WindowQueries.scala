package graft.operators

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 window functions q30–q35.
  *
  * Scale notes: every window partitions on a real key (segment, customer,
  * user) so WindowExec parallelizes across groups after one hash
  * partition + in-partition sort; no global-window (empty partitionBy)
  * patterns, which would serialize onto one task at 100 TB. Window
  * orderings always carry a unique tie-break column ([D1]) so rank and
  * frame contents are deterministic.
  */
object WindowQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Runs through the custom TopKPerGroup operator (plans/TopKPlan.scala):
    // map-side partial top-k bounds the shuffle to k rows per (group,
    // partition) and neither side ever full-sorts a group — the window
    // row_number formulation (the oracle's SQL) shuffles and sorts
    // everything. Total order (price desc, orderkey asc) => identical
    // rows either way, which the oracle gate verifies.
    "q30_rank_topk" -> ((s, dir) =>
      graft.plans.GraftOps.topKPerGroup(
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice")),
        Seq(col("c_mktsegment")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .orderBy("c_mktsegment", "rn")),

    "q31_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          tsOut(col("o_orderdate")).as("o_orderdate"),
          sum(col("o_totalprice").cast(Dec)).over(w).cast("double")
            .as("run_sum"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    "q32_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-3, 3)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          round(sum(col("value").cast(Dec)).over(w).cast("double") /
            count(lit(1)).over(w), 4).as("mov_avg"))
        .orderBy("user_id", "event_id")
    }),

    // Event-time RANGE frame (the interval sibling of q32's ROWS
    // frame): per user, the trailing 1-hour sum/count at every event.
    // Spark range frames take ONE numeric order expression, so the
    // frame orders on epoch µs; ts ties are frame PEERS (identical
    // window for both rows) in both engines, so tie order cannot
    // change any value.
    "q137_range_rolling" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0L)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), tsOut(col("ts")).as("ts"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast(Dec)).over(w).cast("double").as("sum_1h"))
        .orderBy("user_id", "event_id")
    }),

    "q33_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          lag(col("ts"), 1).over(w).as("prev_ts"),
          lead(col("ts"), 1).over(w).as("next_ts"))
        .select(col("user_id"), col("event_id"),
          tsOut(col("ts")).as("ts"),
          tsOut(col("prev_ts")).as("prev_ts"),
          tsOut(col("next_ts")).as("next_ts"),
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"))
        .orderBy("user_id", "event_id")
    }),

    // Global ntile/percent_rank/cume_dist WITHOUT the no-PARTITION
    // window (which would pull the whole table through one task at
    // scale): GlobalRank.rowNumber range-partitions, ranks locally, and
    // offsets by per-partition counts; because the order is total
    // (custkey tie-break) rank == row_number, so the three functions are
    // pure arithmetic on (rn, N) — ntile's uneven-bucket rule included.
    // N rides along from the counts the ranking already collected.
    // PlanShapeSpec asserts no SinglePartition exchange in this plan.
    "q34_ntile_pct" -> ((s, dir) => {
      val (ranked, n) = graft.functions.GlobalRank.rowNumberWithTotal(
        t(s, dir, "customer").select("c_custkey", "c_acctbal"),
        Seq(col("c_acctbal").asc, col("c_custkey").asc))
      val tiles = 4L
      val q = n / tiles
      val r = n % tiles
      // first r tiles take q+1 rows, the rest q (SQL NTILE's rule);
      // `div` = integer division (Column./ would be double division)
      val tile =
        if (q == 0) col("rn")
        else when(col("rn") <= r * (q + 1),
          expr(s"(rn - 1) div ${q + 1} + 1"))
          .otherwise(expr(s"$r + (rn - 1 - ${r * (q + 1)}) div $q + 1"))
      val pctRank =
        if (n <= 1) lit(0d)
        else (col("rn") - 1).cast("double") / lit(n - 1).cast("double")
      ranked.select(col("c_custkey"), col("c_acctbal"),
        tile.cast("long").as("tile"),
        pctRank.as("pct_rank"),
        (col("rn").cast("double") / lit(n).cast("double")).as("cume"))
        .orderBy("c_acctbal", "c_custkey")
    }),

    "q35_first_last" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          first(col("c_custkey")).over(w).as("poorest_cust"),
          last(col("c_custkey")).over(w).as("richest_cust"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // LAST_VALUE ... IGNORE NULLS forward fill inside a keyed window —
    // the per-key streaming sibling of q160's distributed global fill:
    // each line carries the most recent discounted price (>5%) seen by
    // its supplier in (shipdate, orderkey, linenumber) total order.
    // Keyed window (bounded by a supplier's lines), then one hash agg;
    // the gate pins fill correctness via per-supplier fill counts and
    // the exact cent sum of the filled series.
    "q189_fill_ignore_nulls" -> ((s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"),
          when(col("l_discount") > 0.05,
            round(col("l_extendedprice") * 100).cast("long")).as("dp"))
        .withColumn("filled", last(col("dp"), ignoreNulls = true).over(w))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_lines"),
          count(col("filled")).as("n_filled"),
          sum(col("filled").cast("decimal(38,0)")).cast("long")
            .as("sum_filled"))
        .orderBy("l_suppkey")
        .limit(25)
    }),

    // RATIO_TO_REPORT — Redshift's percent-of-total window verb: each
    // nation's revenue as a share of its region's total. The grouped
    // revenue is an exact decimal sum ([D2]); the window total is a sum
    // of those decimals over the 5-nation region partition, so the
    // division sees identical operands in both engines. Aggregation
    // happens BEFORE the window, so the window input is 25 rows — the
    // shape that stays cheap at any fact-table scale.
    "q194_ratio_to_report" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val rev = o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"), col("n_name"))
        .agg(decSum(col("o_totalprice")).as("rev"))
      val w = Window.partitionBy("n_regionkey")
      rev.select(col("n_regionkey"), col("n_name"),
          col("rev").cast("double").as("nation_rev"),
          round(col("rev").cast("double") /
            sum(col("rev")).over(w).cast("double"), 4).as("rev_share"))
        .orderBy("n_regionkey", "n_name")
    }),

    // NTH_VALUE + offset-with-default — the remaining Redshift window
    // navigation verbs: 3rd-poorest customer id per segment (full-frame
    // NTH_VALUE) and LAG/LEAD at offset 2 with explicit defaults (the
    // default fires at partition edges, so its value is gated too).
    "q195_nth_value" -> ((s, dir) => {
      val ord = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      val full = ord.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          nth_value(col("c_custkey"), 3).over(full).as("third_poorest"),
          lag(col("c_custkey"), 2, -1L).over(ord).as("prev2_cust"),
          lead(col("c_custkey"), 2, -1L).over(ord).as("next2_cust"))
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
    }),

    // Top-k WITH TIES — RANK() (not ROW_NUMBER) keeps every row tied at
    // the cutoff: all parts sharing a top-3 size in their brand. Sizes
    // tie heavily (50 values over thousands of parts per brand), so the
    // tie-inclusion semantics are what the gate actually exercises; the
    // per-(brand, size) rollup keeps the output deterministic without a
    // unique-column tiebreak.
    "q196_topk_ties" -> ((s, dir) => {
      val w = Window.partitionBy("p_brand").orderBy(col("p_size").desc)
      t(s, dir, "part")
        .select(col("p_brand"), col("p_size"),
          rank().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
        .groupBy("p_brand", "p_size")
        .agg(min(col("rnk")).cast("long").as("rnk"),
          count(lit(1)).as("n_parts"))
        .orderBy("p_brand", "p_size")
    }),

    // Numeric RANGE frame — the VALUE-based window (q137 is its
    // event-time sibling): per part, how many same-brand parts sit
    // within ±2 sizes, and their exact cent sum. RANGE peers make every
    // (brand, size) row carry identical frame results, so the distinct
    // collapses duplicates and the output needs no per-row tiebreak.
    // Keyed window (brand partitions), exact integer cents [D2].
    "q219_range_numeric" -> ((s, dir) => {
      val w = Window.partitionBy("p_brand").orderBy(col("p_size").asc)
        .rangeBetween(-2, 2)
      t(s, dir, "part")
        .select(col("p_brand"), col("p_size"),
          count(lit(1)).over(w).as("n_band"),
          sum(round(col("p_retailprice") * 100).cast("long")).over(w)
            .as("band_cents"))
        .distinct()
        .orderBy("p_brand", "p_size")
    })
  )

  val oracle: Map[String, String] = Map(
    "q30_rank_topk" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |           ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) x
        |WHERE rn <= 3
        |ORDER BY c_mktsegment ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,

    "q31_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
        |FROM orders
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderdate ASC NULLS FIRST,
        |         o_orderkey ASC NULLS FIRST""".stripMargin,

    "q32_moving_avg" ->
      """SELECT user_id, event_id,
        |       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
        |             / COUNT(*) OVER w, 4) AS mov_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
        |  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,

    "q137_range_rolling" ->
      """SELECT user_id, event_id, ts,
        |       COUNT(*) OVER w AS n_1h,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
        |         AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,

    "q33_lag_lead" ->
      """SELECT user_id, event_id, ts,
        |       LAG(ts) OVER w AS prev_ts,
        |       LEAD(ts) OVER w AS next_ts,
        |       epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,

    "q34_ntile_pct" ->
      """SELECT c_custkey, c_acctbal,
        |       CAST(NTILE(4) OVER w AS BIGINT) AS tile,
        |       PERCENT_RANK() OVER w AS pct_rank,
        |       CUME_DIST() OVER w AS cume
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC NULLS FIRST)
        |ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,

    "q35_first_last" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |       FIRST_VALUE(c_custkey) OVER w AS poorest_cust,
        |       LAST_VALUE(c_custkey) OVER w AS richest_cust
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC NULLS FIRST
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_mktsegment ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,

    "q189_fill_ignore_nulls" ->
      """WITH v AS (
        |  SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        |    CASE WHEN l_discount > 0.05
        |         THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END AS dp
        |  FROM lineitem),
        |f AS (
        |  SELECT l_suppkey,
        |    LAST_VALUE(dp IGNORE NULLS) OVER (
        |      PARTITION BY l_suppkey
        |      ORDER BY l_shipdate ASC NULLS FIRST, l_orderkey ASC,
        |               l_linenumber ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM v)
        |SELECT l_suppkey, COUNT(*) AS n_lines, COUNT(filled) AS n_filled,
        |  CAST(SUM(CAST(filled AS DECIMAL(38,0))) AS BIGINT) AS sum_filled
        |FROM f GROUP BY 1 ORDER BY l_suppkey ASC NULLS FIRST
        |LIMIT 25""".stripMargin,

    "q194_ratio_to_report" ->
      """WITH rev AS (
        |  SELECT n_regionkey, n_name,
        |         SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_regionkey, n_name,
        |       CAST(rev AS DOUBLE) AS nation_rev,
        |       ROUND(CAST(rev AS DOUBLE) /
        |             CAST(SUM(rev) OVER (PARTITION BY n_regionkey) AS DOUBLE),
        |             4) AS rev_share
        |FROM rev
        |ORDER BY n_regionkey ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q195_nth_value" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |       NTH_VALUE(c_custkey, 3) OVER (PARTITION BY c_mktsegment
        |         ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC NULLS FIRST
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS third_poorest,
        |       LAG(c_custkey, 2, -1) OVER w AS prev2_cust,
        |       LEAD(c_custkey, 2, -1) OVER w AS next2_cust
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC NULLS FIRST)
        |ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal ASC NULLS FIRST,
        |         c_custkey ASC NULLS FIRST""".stripMargin,

    "q196_topk_ties" ->
      """SELECT p_brand, p_size, MIN(rnk) AS rnk, COUNT(*) AS n_parts
        |FROM (
        |  SELECT p_brand, p_size,
        |         RANK() OVER (PARTITION BY p_brand
        |           ORDER BY p_size DESC NULLS LAST) AS rnk
        |  FROM part) x
        |WHERE rnk <= 3
        |GROUP BY 1, 2
        |ORDER BY p_brand ASC NULLS FIRST, p_size ASC NULLS FIRST""".stripMargin,

    "q219_range_numeric" ->
      """SELECT DISTINCT p_brand, p_size,
        |  COUNT(*) OVER w AS n_band,
        |  CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) OVER w
        |       AS BIGINT) AS band_cents
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_size ASC
        |  RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY p_brand ASC NULLS FIRST, p_size ASC NULLS FIRST""".stripMargin
  )
}
