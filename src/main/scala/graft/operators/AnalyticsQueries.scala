package graft.operators

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operational-analytics operators over the event log and order history —
  * the reporting queries the reference's microservice serves from its
  * aggregation endpoints: exact per-group mode (q47), activity-
  * concentration entropy (q48), ordered conversion funnels (q53) and
  * cohort retention (q54).
  *
  * Scale notes:
  *  - q47 is a hash aggregation to (group, value) counts — map-side
  *    combinable, so the shuffle carries distinct values, not rows —
  *    followed by the bounded-heap top-1, never a full per-group sort.
  *  - q48 aggregates to (type, hour) buckets first; the entropy terms
  *    are computed per bucket and decimal-summed (order-independent), so
  *    the only data-sized pass is the initial partial agg.
  *  - q53's three funnel stages are successive aggregate→equi-join
  *    rounds on user_id: each stage's output is one row per qualifying
  *    user (monotonically shrinking), and AQE broadcasts it back against
  *    the event scan once it fits — no window over the raw log.
  *  - q54 reduces the log to distinct (user, day) pairs before any join;
  *    the cohort table is one row per user. Both are tiny relative to
  *    the log at any scale; the final rollup groups (cohort, offset).
  */
object AnalyticsQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact per-group mode: the most frequent order priority per order
    // status, ties broken toward the smaller priority string. The
    // count table is a partial-aggregated hash agg; the argmax runs
    // through the bounded-heap top-k operator (k=1), so no group is
    // ever sorted whole.
    "q47_mode" -> ((s, dir) => {
      val cnt = t(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      graft.plans.GraftOps.topKPerGroup(cnt,
        Seq(col("o_orderstatus")),
        Seq(col("cnt").desc, col("o_orderpriority").asc), 1, rankName = "rk")
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("cnt"))
        .orderBy("o_orderstatus")
    }),

    // Shannon entropy of each event type's hourly activity distribution
    // — "how bursty is this signal". Determinism: each bucket's term
    // -p·ln(p) is one fixed double formula (identical libm inputs on
    // both engines), quantized to 6dp and decimal-summed so the total
    // is independent of partition/merge order [D2-style].
    "q48_entropy" -> ((s, dir) => {
      val hb = t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("nh"))
      val tot = hb.groupBy("event_type")
        .agg(sum("nh").as("n"), count(lit(1)).as("n_hours"))
      hb.join(tot, "event_type")
        .withColumn("p", col("nh").cast("double") / col("n"))
        .withColumn("term", round(-col("p") * log(col("p")), 6))
        .groupBy("event_type")
        .agg(max("n").as("n_events"), max("n_hours").as("n_hours"),
          round(sum(col("term").cast(Dec)).cast("double"), 4).as("entropy"))
        .orderBy("event_type")
    }),

    // OHLC bars: per (event_type, hour) the first/last event's value
    // (open/close, ordered by the total (ts, event_id) key) plus
    // high/low/count — the classic time-bar rollup, and the min_by/
    // max_by surface. One map-side-combinable hash agg, one shuffle;
    // values pass through without arithmetic, so no float drift.
    "q49_ohlc" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
          max("value").as("high"), min("value").as("low"),
          count(lit(1)).as("n"))
        .select(col("event_type"), tsOut(col("hr")).as("hr"), col("open"),
          col("close"), col("high"), col("low"), col("n"))
        .orderBy("event_type", "hr")),

    // Ordered conversion funnel: users whose first signup precedes a
    // view precedes a purchase, strictly increasing in time. Stage k
    // counts users reaching step k; each stage is min(ts) over the
    // events after the previous stage's timestamp.
    //
    // Single scan, single shuffle: running mins over the per-user
    // time-ordered window stage the same t1/t2/t3 the self-join form
    // computes. At each row the running min of signup timestamps equals
    // the user's GLOBAL first-signup t1 whenever t1 <= row ts, and the
    // strict `>` makes the boundary row agree, so marking a view
    // qualified iff ts > running-t1 is exactly "ts > t1" — same argument
    // one level up for purchases vs the qualified-view running min. The
    // three Window ops share one partitioning+sort (one exchange), and
    // the per-user groupBy reuses that partitioning (no second shuffle)
    // — vs three events scans, three shuffles, and two joins before.
    "q53_funnel" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .filter(col("event_type").isin("signup", "view", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("t1r",
          min(when(col("event_type") === "signup", col("ts"))).over(w))
        .withColumn("t2c",
          when(col("event_type") === "view" && col("ts") > col("t1r"),
            col("ts")))
        .withColumn("t2r", min(col("t2c")).over(w))
        .withColumn("t3c",
          when(col("event_type") === "purchase" && col("ts") > col("t2r"),
            col("ts")))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("t1"),
          min(col("t2c")).as("t2"), min(col("t3c")).as("t3"))
        .filter(col("t1").isNotNull)
        .agg(count(lit(1)).as("n_signup"), count(col("t2")).as("n_view"),
          count(col("t3")).as("n_purchase"))
        .selectExpr("""stack(3,
            1, 'signup_first', n_signup,
            2, 'view_after_signup', n_view,
            3, 'purchase_after_view', n_purchase) AS (stage, step, n_users)""")
        .orderBy("stage")
    }),

    // Cohort retention: cohort = the day of a user's first event;
    // n_users = users from that cohort active again k days later
    // (k = 0..7). The activity table is distinct (user, day), so each
    // user contributes at most one row per (cohort, offset) and a plain
    // count is already a distinct-user count.
    "q54_retention" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val firstDay = e.groupBy("user_id")
        .agg(date_trunc("day", min("ts")).as("cohort"))
      val activity = e
        .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .distinct()
      activity.join(firstDay, Seq("user_id"))
        .withColumn("day_offset", datediff(col("d"), col("cohort")))
        .filter(col("day_offset") <= 7)
        .groupBy(col("cohort"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .select(tsOut(col("cohort")).as("cohort_day"), col("day_offset"),
          col("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Clickstream transition matrix + top-3 next events per state: a
    // lag window per user (partitioned on user_id — per-user histories
    // are small at any corpus size, so the window parallelizes in the
    // user count) reduced to (prev, next) counts, then the bounded-heap
    // TopKPerGroup. (ts, event_id) is a total order, so lag is
    // deterministic under ties.
    "q108_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val tr = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
      val cnt = tr.groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("cnt"))
      graft.plans.GraftOps.topKPerGroup(cnt, Seq(col("prev_type")),
          Seq(col("cnt").desc, col("event_type").asc), 3)
        .orderBy("prev_type", "rn")
    }),

    // Per-user inter-event burstiness: gaps between consecutive events
    // (total order: ts, then event_id) in exact integer microseconds,
    // summarized as the mean gap in seconds and the coefficient of
    // variation (CV = σ/μ: ≫1 bursty, ≈1 Poisson-like, ≪1 metronomic)
    // — the arrival-pattern screen behind bot detection and session
    // tuning. Determinism: the first moment is an exact BIGINT µs sum;
    // the squared terms are 6dp-quantized seconds, decimal-summed [D2]
    // (q113's regression-sum pattern) — both partition-invariant. The
    // lag window partitions on user_id (parallel in the user count, no
    // global sort); a user whose gaps are all zero gets a NULL CV
    // (safeDiv), mirroring the oracle's CASE.
    "q125_event_burstiness" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val gaps = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_us", col("us") - lag("us", 1).over(w))
      val meanS = col("sum_us").cast("double") / col("n_gaps") / lit(1e6)
      val varS = col("m2").cast("double") / col("n_gaps") - meanS * meanS
      gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          count(col("gap_us")).as("n_gaps"),
          sum(col("gap_us")).as("sum_us"),
          decSum(round((col("gap_us").cast("double") / lit(1e6))
            * (col("gap_us").cast("double") / lit(1e6)), 6)).as("m2"))
        .filter(col("n_gaps") >= 2)
        .select(col("user_id"), col("n_events"),
          round(meanS, 4).as("mean_gap4"),
          round(safeDiv(sqrt(greatest(varS, lit(0.0))), meanS), 4)
            .as("cv4"))
        .orderBy("user_id")
    }),

    // Cumulative user growth — the activation curve: users bucket to
    // their FIRST-seen day, and the running total of those buckets is
    // the distinct-users-to-date series. The per-user min and the
    // per-day count both collapse map-side; the cumulative sum runs
    // through the range-partitioned GlobalRank.cumSum (constant group)
    // over the day-bucket table — dimension-bounded rows, no
    // single-partition window over the corpus.
    "q142_user_growth" -> ((s, dir) => {
      val days = t(s, dir, "events")
        .groupBy("user_id").agg(min(col("ts")).as("first_ts"))
        .select(unix_micros(date_trunc("day", col("first_ts")))
          .as("day_us"))
        .groupBy("day_us").agg(count(lit(1)).as("new_users"))
        .withColumn("g", lit(1))
      graft.functions.GlobalRank.cumSum(days, "g", "day_us", "new_users")
        .select(tsOut(timestamp_micros(col("day_us"))).as("day"),
          col("new_users"), col("cum").as("cum_users"))
        .orderBy("day")
    }),

    // Last-touch revenue attribution: each purchase credits its value
    // to the most recent PRECEDING non-purchase event of the same user
    // ('none' when the purchase opens the stream). One keyed window
    // with an ignore-nulls last over the preceding frame — the
    // marketing-attribution verb, no self-join.
    "q138_attribution" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "events")
        .select(col("event_type"), col("value"),
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w).as("touch"))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
        .agg(count(lit(1)).as("n_purchases"),
          decSumD(col("value")).as("attributed"))
        .orderBy("touch")
    })
  )

  val oracle: Map[String, String] = Map(
    "q142_user_growth" ->
      """WITH f AS (
        |  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
        |), d AS (
        |  SELECT date_trunc('day', first_ts) AS day, COUNT(*) AS new_users
        |  FROM f GROUP BY 1)
        |SELECT day, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY day ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM d ORDER BY day ASC NULLS FIRST""".stripMargin,

    "q138_attribution" ->
      """WITH attr AS (
        |  SELECT event_type, value,
        |    LAST_VALUE(CASE WHEN event_type != 'purchase'
        |               THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch
        |  FROM events)
        |SELECT COALESCE(touch, 'none') AS touch,
        |  COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS attributed
        |FROM attr WHERE event_type = 'purchase'
        |GROUP BY 1
        |ORDER BY touch ASC NULLS FIRST""".stripMargin,

    "q47_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
        |FROM c
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |  ORDER BY cnt DESC NULLS LAST, o_orderpriority ASC NULLS FIRST) = 1
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q48_entropy" ->
      """WITH hb AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS nh
        |  FROM events GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, CAST(SUM(nh) AS BIGINT) AS n,
        |         COUNT(*) AS n_hours
        |  FROM hb GROUP BY 1
        |), terms AS (
        |  SELECT hb.event_type, tot.n, tot.n_hours,
        |         ROUND(-(CAST(nh AS DOUBLE) / n)
        |               * ln(CAST(nh AS DOUBLE) / n), 6) AS term
        |  FROM hb JOIN tot USING (event_type))
        |SELECT event_type, MAX(n) AS n_events, MAX(n_hours) AS n_hours,
        |       ROUND(CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE), 4)
        |         AS entropy
        |FROM terms GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,

    "q49_ohlc" ->
      """WITH b AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr, ts, event_id,
        |         value
        |  FROM events
        |), o AS (
        |  SELECT event_type, hr, value AS open FROM b
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, hr
        |    ORDER BY ts ASC, event_id ASC) = 1
        |), c AS (
        |  SELECT event_type, hr, value AS close FROM b
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, hr
        |    ORDER BY ts DESC, event_id DESC) = 1
        |), a AS (
        |  SELECT event_type, hr, MAX(value) AS high, MIN(value) AS low,
        |         COUNT(*) AS n
        |  FROM b GROUP BY 1, 2)
        |SELECT a.event_type, a.hr, o.open, c.close, a.high, a.low, a.n
        |FROM a JOIN o USING (event_type, hr) JOIN c USING (event_type, hr)
        |ORDER BY event_type ASC NULLS FIRST, hr ASC NULLS FIRST""".stripMargin,

    "q53_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1
        |), v1 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'view' GROUP BY 1
        |), p1 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN v1 ON e.user_id = v1.user_id AND e.ts > v1.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1
        |), agg AS (
        |  SELECT COUNT(*) AS n_signup, COUNT(v1.t2) AS n_view,
        |         COUNT(p1.t3) AS n_purchase
        |  FROM s1 LEFT JOIN v1 USING (user_id) LEFT JOIN p1 USING (user_id))
        |SELECT stage, step, n_users FROM (
        |  SELECT 1 AS stage, 'signup_first' AS step, n_signup AS n_users
        |  FROM agg
        |  UNION ALL
        |  SELECT 2, 'view_after_signup', n_view FROM agg
        |  UNION ALL
        |  SELECT 3, 'purchase_after_view', n_purchase FROM agg) u
        |ORDER BY stage ASC NULLS FIRST""".stripMargin,

    "q54_retention" ->
      """WITH f AS (
        |  SELECT user_id, date_trunc('day', MIN(ts)) AS cohort
        |  FROM events GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
        |SELECT f.cohort AS cohort_day,
        |       CAST(date_diff('day', f.cohort, a.d) AS INT) AS day_offset,
        |       COUNT(*) AS n_users
        |FROM a JOIN f USING (user_id)
        |WHERE date_diff('day', f.cohort, a.d) <= 7
        |GROUP BY 1, 2
        |ORDER BY cohort_day ASC NULLS FIRST, day_offset ASC NULLS FIRST""".stripMargin,

    "q108_event_transitions" ->
      """WITH tr AS (
        |  SELECT LAG(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts ASC, event_id ASC) AS prev_type,
        |         event_type
        |  FROM events
        |), c AS (
        |  SELECT prev_type, event_type, COUNT(*) AS cnt FROM tr
        |  WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type)
        |SELECT prev_type, event_type, cnt, rn FROM (
        |  SELECT prev_type, event_type, cnt,
        |         ROW_NUMBER() OVER (PARTITION BY prev_type
        |           ORDER BY cnt DESC NULLS LAST, event_type ASC NULLS FIRST)
        |           AS rn
        |  FROM c) x
        |WHERE rn <= 3
        |ORDER BY prev_type ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,

    // The mean/CV expression trees mirror the Spark builder node for
    // node (same association order), so every double is identical.
    "q125_event_burstiness" ->
      """WITH g AS (
        |  SELECT user_id,
        |         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts ASC, event_id ASC) AS gap_us
        |  FROM events
        |), a AS (
        |  SELECT user_id, COUNT(*) AS n_events, COUNT(gap_us) AS n_gaps,
        |         SUM(gap_us) AS sum_us,
        |         SUM(CAST(ROUND((CAST(gap_us AS DOUBLE) / 1000000.0)
        |             * (CAST(gap_us AS DOUBLE) / 1000000.0), 6)
        |             AS DECIMAL(38,6))) AS m2
        |  FROM g GROUP BY user_id HAVING COUNT(gap_us) >= 2)
        |SELECT user_id, n_events,
        |       ROUND(CAST(sum_us AS DOUBLE) / n_gaps / 1000000.0, 4)
        |         AS mean_gap4,
        |       ROUND(CASE WHEN CAST(sum_us AS DOUBLE) / n_gaps / 1000000.0
        |                       != 0
        |             THEN sqrt(greatest(CAST(m2 AS DOUBLE) / n_gaps
        |                  - (CAST(sum_us AS DOUBLE) / n_gaps / 1000000.0)
        |                  * (CAST(sum_us AS DOUBLE) / n_gaps / 1000000.0),
        |                  0.0))
        |                  / (CAST(sum_us AS DOUBLE) / n_gaps / 1000000.0)
        |             END, 4) AS cv4
        |FROM a ORDER BY user_id ASC NULLS FIRST""".stripMargin
  )
}
