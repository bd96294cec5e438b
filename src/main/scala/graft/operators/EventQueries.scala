package graft.operators

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.9 event-time windowing q50–q52 (batch forms; the same expressions
  * run under Structured Streaming — proven in StreamingSpec).
  *
  * Scale notes: `window()`/`session_window()` group on (bucket, key) so
  * partial aggregation happens map-side before the shuffle; the sliding
  * window fans each row out to windowSize/slide buckets (4 here) *before*
  * the partial agg, which is the standard Spark plan and still shuffles
  * only one row per (bucket, partition).
  */
object EventQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Log-rank test — do BUILDING and MACHINERY customers differ in
    // time-to-repeat-purchase? The standard two-sample survival
    // comparison over q265's machinery: per customer, days from first
    // order DATE to the next distinct order date (censored at the
    // dataset's last date when no repeat exists); at each event time
    // the hypergeometric expectation/variance of group-1 events given
    // the at-risk margins; χ² = (O1−E1)²/V. The corpus collapses to
    // the (group, day) histogram FIRST (value-domain bounded by the
    // calendar); the at-risk table is a bounded spine×histogram theta
    // join (documented BNLJ — both sides ≤ the day domain at any
    // corpus size); per-time terms are shared-string IEEE trees
    // (LrFormula), 8dp-quantized and decimal-summed [D2].
    "q306_logrank" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      val firstO = o.groupBy("o_custkey").agg(min(col("day")).as("t1"))
      val secondO = o.join(firstO, Seq("o_custkey"))
        .filter(col("day") > col("t1"))
        .groupBy("o_custkey").agg(min(col("day")).as("t2"))
      val seg = t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey").as("o_custkey"),
          when(col("c_mktsegment") === "BUILDING", 0L).otherwise(1L)
            .as("g"))
      val usr = firstO.join(secondO, Seq("o_custkey"), "left")
        .join(seg, Seq("o_custkey"))
        .crossJoin(broadcast(o.agg(max(col("day")).as("dmax"))))
        .select(col("g"),
          when(col("t2").isNotNull, datediff(col("t2"), col("t1")))
            .otherwise(datediff(col("dmax"), col("t1"))).cast("long")
            .as("k"),
          col("t2").isNotNull.cast("long").as("ev"))
      val hist = usr.groupBy("g", "k")
        .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"))
      val users = hist.groupBy("g").agg(sum(col("m")).as("nu"))
      val sp = hist.groupBy("k")
        .agg(sum(col("d")).as("d"),
          sum(when(col("g") === 0, col("d")).otherwise(0L)).as("d1"))
        .filter(col("d") > 0)
      val risks = hist.join(broadcast(sp.select(col("k").as("kk"))),
          col("k") >= col("kk"))
        .groupBy("kk", "g").agg(sum(col("m")).as("nr"))
      val terms = sp
        .join(risks.filter(col("g") === 0)
          .select(col("kk").as("k"), col("nr").as("n1k")), Seq("k"), "left")
        .join(risks.filter(col("g") === 1)
          .select(col("kk").as("k"), col("nr").as("n2k")), Seq("k"), "left")
        .select(col("k"), col("d"), col("d1"),
          coalesce(col("n1k"), lit(0L)).as("n1k"),
          coalesce(col("n2k"), lit(0L)).as("n2k"))
        .select(col("d1"),
          expr(LrFormula.e1term8).cast("decimal(38,8)").as("e1t"),
          expr(LrFormula.vterm8).cast("decimal(38,8)").as("vt"))
      terms.agg(sum(col("d1")).as("o1"), sum(col("e1t")).as("e1s"),
          sum(col("vt")).as("vs"))
        .crossJoin(broadcast(users.filter(col("g") === 0)
          .select(col("nu").as("n1_users"))))
        .crossJoin(broadcast(users.filter(col("g") === 1)
          .select(col("nu").as("n2_users"))))
        .select(col("n1_users"), col("n2_users"), col("o1"),
          round(col("e1s").cast("double"), 6).as("e1_6"),
          expr(LrFormula.chi4).as("chi4"))
    }),

    // Freshness / staleness monitor — the ingestion-health endpoint a
    // pipeline dashboard polls: per event type the last-seen event
    // time, the lag in whole minutes behind the freshest stream, and
    // the row volume. Lag is EXACT integer microsecond arithmetic
    // (epoch-µs difference, truncating minute division — no calendar
    // boundary-crossing semantics to diverge between engines). One
    // map-side-combinable agg; the 1-row global max attaches
    // broadcast (documented BNLJ).
    "q282_freshness_lag" -> ((s, dir) => {
      val per = t(s, dir, "events").groupBy("event_type")
        .agg(max("ts").as("mx"), count(lit(1)).as("n_events"))
      per.crossJoin(broadcast(per.agg(max("mx").as("gmax"))))
        .select(col("event_type"), tsOut(col("mx")).as("last_ts"),
          expr("(unix_micros(gmax) - unix_micros(mx)) div 60000000L")
            .as("lag_min"),
          col("n_events"))
        .orderBy("event_type")
    }),

    "q50_win_tumbling" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), decSumD(col("value")).as("sum_value"))
        .select(tsOut(col("window.start")).as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")),

    "q51_win_sliding" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), decSumD(col("value")).as("sum_value"))
        .select(tsOut(col("window.start")).as("window_start"),
          col("n"), col("sum_value"))
        .orderBy("window_start")),

    "q52_win_session" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("mx"))
        .select(col("user_id"),
          tsOut(col("session_window.start")).as("session_start"),
          tsOut(col("mx")).as("last_ts"),
          col("n_events"))
        .orderBy("user_id", "session_start")),

    // Rolling 7-day active users per day — the WAU engagement curve.
    // Distributed shape: distinct (user, day) pairs fan out to the 7
    // target days each pair contributes to (CONSTANT fan-out via
    // explode(sequence), no range join), then one distinct-count per
    // target day; only days that actually occur are reported. The
    // shuffle carries (day, user) pairs — never a window over the raw
    // event log [D2].
    "q177_rolling_wau" -> ((s, dir) => {
      val ud = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val days = ud.select("day").distinct()
      ud.withColumn("target",
          explode(expr("sequence(day, date_add(day, 6))")))
        .join(days.withColumnRenamed("day", "target"), Seq("target"))
        .groupBy(col("target"))
        .agg(count_distinct(col("user_id")).as("wau"))
        .select(tsOut(col("target").cast("timestamp")).as("day"), col("wau"))
        .orderBy("day")
    }),

    // Signup→first-purchase conversion latency per signup day: median
    // and p90 seconds-to-convert among signups converting within 7
    // days. The candidate join is per-user (user activity is
    // schema-bounded per day, the equi key carries the fan-out), first
    // purchase collapses via min BEFORE any percentile machinery, and
    // the percentiles run through the q44 histogram + distributed
    // cumSum — no per-day sort [D2].
    "q178_time_to_convert" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val su = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("sts"))
      val pu = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
      val conv = su.join(pu, Seq("user_id"))
        .filter(col("pts") > col("sts") &&
          col("pts") <= col("sts") + expr("INTERVAL 7 DAYS"))
        .groupBy(col("user_id"), col("sts"))
        .agg(min(col("pts")).as("pts"))
      val lat = conv.select(to_date(col("sts")).as("day"),
        ((unix_micros(col("pts")) - unix_micros(col("sts")))
          / lit(1000000L)).cast("long").as("secs"))
      val hist = lat.groupBy("day", "secs").agg(count(lit(1)).as("cnt"))
      graft.functions.GlobalRank.cumSum(hist, "day", "secs", "cnt")
        .groupBy("day")
        .agg(max(col("n")).as("n_conv"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("secs")))
            .as("p50_secs"),
          min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("secs")))
            .as("p90_secs"))
        .select(tsOut(col("day").cast("timestamp")).as("day"),
          col("n_conv"), col("p50_secs"), col("p90_secs"))
        .orderBy("day")
    }),

    // Kaplan–Meier / Nelson–Aalen survival (round 10) — the survival-
    // analysis family the event log lacked (q178 reports converter
    // latency percentiles; THIS handles the censored users q178 must
    // drop): time from first signup to first subsequent purchase,
    // non-converters censored at their last observed event. Per event
    // day k: the risk set n_k (users still unconverted and
    // uncensored), events d_k, the Nelson–Aalen cumulative hazard
    // Σ d/n, and the KM log-survival Σ ln(1 − d/n) — each per-day
    // term 8dp-quantized to decimal and decimal-summed ([D2], the
    // q175 convention), so the curves are partition- and
    // engine-invariant. KM is emitted in LOG form deliberately: the
    // repo's ln-at-8dp replay is proven across engines (q48/q98/q112
    // family) while exp() has no cross-engine precedent — the
    // portable contract stops at the quantized log. A terminal day
    // with d = n (survival hits zero) reports NULL log-survival, not
    // ln(0). Risk sets come from ONE cumulative pass over the
    // day-histogram (user-sized agg first, day-sized after — nothing
    // rescans the log); the curve relation is day-count-sized.
    "q265_kaplan_meier" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id").isNotNull)
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t0"))
      val agg = ev.select(col("user_id"), unix_micros(col("ts")).as("tus"),
          col("event_type"))
        .join(s0, Seq("user_id"))
        .groupBy("user_id", "t0")
        .agg(min(when(col("event_type") === "purchase"
          && col("tus") > col("t0"), col("tus"))).as("tp"),
          max(col("tus")).as("tmax"))
      val usr = agg.select(
        when(col("tp").isNotNull, expr("(tp - t0) div 86400000000L"))
          .otherwise(expr("(tmax - t0) div 86400000000L")).as("k"),
        col("tp").isNotNull.cast("long").as("ev"))
      val days = usr.groupBy("k")
        .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"))
        .withColumn("g", lit(1))
      val base = graft.functions.GlobalRank.cumSum(days, "g", "k", "m")
        .filter(col("d") > 0)
        .withColumn("n_risk", col("n") - col("cum") + col("m"))
        .select(col("g"), col("k"), col("n_risk"), col("d"),
          when(col("d") < col("n_risk"),
            round(log(lit(1d) - col("d").cast("double") / col("n_risk")),
              8).cast("decimal(38,8)")).as("f8"),
          round(col("d").cast("double") / col("n_risk"), 8)
            .cast("decimal(38,8)").as("h8"))
        .localCheckpoint(true)
      val cf = graft.functions.GlobalRank.cumSum(base, "g", "k", "f8")
        .select(col("k"), col("cum").as("cf"))
      val ch = graft.functions.GlobalRank.cumSum(base, "g", "k", "h8")
        .select(col("k"), col("cum").as("chz"))
      base.join(cf, Seq("k")).join(ch, Seq("k"))
        .select(col("k").as("day"), col("n_risk"),
          col("d").as("n_events"),
          round(col("chz").cast("double"), 6).as("na_cumhaz6"),
          when(col("d") < col("n_risk"),
            round(col("cf").cast("double"), 6)).as("km_log_s6"))
        .orderBy("day")
    }),

    // Behavioral trigram motifs: the top-15 3-event-type sequences
    // across per-user ordered activity streams. TWO LEADs over ONE
    // keyed window (partitioned by user, ordered by (ts, event_id) —
    // a total order, so the sequence is partition-layout-invariant) —
    // a single shuffle of the log, no self-joins, no per-user
    // collect_list that would blow up on a hot user at 100 TB.
    "q179_event_trigrams" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .select(col("event_type").as("t1"),
          lead(col("event_type"), 1).over(w).as("t2"),
          lead(col("event_type"), 2).over(w).as("t3"))
        .filter(col("t2").isNotNull && col("t3").isNotNull)
        .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("t1").asc, col("t2").asc,
          col("t3").asc)
        .limit(15)
    }),

    // Day-of-week × hour-of-day activity heatmap — the weekly traffic
    // profile. The weekday derives ARITHMETICALLY from the epoch day
    // ((days + 3) mod 7, 0 = Monday; 1970-01-01 was a Thursday) because
    // the engines' dayofweek() builtins disagree on both origin and
    // base — the portable form is part of the operator's determinism
    // contract. One 168-cell map-side-combinable count plus a
    // broadcast one-row total for the share.
    "q211_dow_hour" -> ((s, dir) => {
      val cells = t(s, dir, "events")
        .select(((datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")) + 3) % 7).as("dow"),
          hour(col("ts")).as("hod"))
        .groupBy("dow", "hod").agg(count(lit(1)).as("n"))
      cells.crossJoin(broadcast(cells.agg(sum(col("n")).as("tot"))))
        .select(col("dow"), col("hod"), col("n"),
          round(col("n").cast("double") / col("tot"), 6).as("share6"))
        .orderBy("dow", "hod")
    })
  )

  /** q306's per-event-time log-rank terms over the exact integer
    * margins (d total events, n1k/n2k at-risk per group) and the final
    * χ² — shared texts, one IEEE tree each (OlsFormula convention).
    * The variance term is the hypergeometric V_k =
    * d·(n1/n)·(n2/n)·(n−d)/(n−1), 0 when only one subject is at risk
    * (no information); χ² NULL when V = 0 (degenerate margins). */
  private[operators] object LrFormula {
    private val nn = "CAST(n1k + n2k AS DOUBLE)"
    val e1term8: String =
      s"round(CAST(d AS DOUBLE) * CAST(n1k AS DOUBLE) / $nn, 8)"
    val vterm8: String = "CASE WHEN n1k + n2k > 1 THEN " +
      s"round(CAST(d AS DOUBLE) * (CAST(n1k AS DOUBLE) / $nn) " +
      s"* (CAST(n2k AS DOUBLE) / $nn) " +
      s"* (CAST(n1k + n2k - d AS DOUBLE) " +
      s"/ CAST(n1k + n2k - 1 AS DOUBLE)), 8) ELSE 0.0 END"
    val chi4: String = "CASE WHEN CAST(vs AS DOUBLE) > 0 THEN " +
      "round((CAST(o1 AS DOUBLE) - CAST(e1s AS DOUBLE)) " +
      "* (CAST(o1 AS DOUBLE) - CAST(e1s AS DOUBLE)) " +
      "/ CAST(vs AS DOUBLE), 4) END"
  }

  val oracle: Map[String, String] = Map(

    // identical first/second-order collapse, (group, day) histogram,
    // spine×histogram at-risk join, and the SAME term/χ² texts
    "q306_logrank" ->
      s"""WITH o AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day
         |  FROM orders),
         |f1 AS (SELECT o_custkey, MIN(day) AS t1 FROM o GROUP BY 1),
         |f2 AS (
         |  SELECT o.o_custkey, MIN(o.day) AS t2
         |  FROM o JOIN f1 ON f1.o_custkey = o.o_custkey
         |  WHERE o.day > f1.t1 GROUP BY 1),
         |dmax AS (SELECT MAX(day) AS dmax FROM o),
         |seg AS (
         |  SELECT c_custkey AS o_custkey,
         |         CAST(CASE WHEN c_mktsegment = 'BUILDING' THEN 0
         |              ELSE 1 END AS BIGINT) AS g
         |  FROM customer
         |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         |usr AS (
         |  SELECT seg.g,
         |         CAST(CASE WHEN f2.t2 IS NOT NULL
         |              THEN datediff('day', f1.t1, f2.t2)
         |              ELSE datediff('day', f1.t1, dmax.dmax) END
         |           AS BIGINT) AS k,
         |         CAST(CASE WHEN f2.t2 IS NOT NULL THEN 1 ELSE 0 END
         |           AS BIGINT) AS ev
         |  FROM f1
         |  LEFT JOIN f2 ON f2.o_custkey = f1.o_custkey
         |  JOIN seg ON seg.o_custkey = f1.o_custkey
         |  CROSS JOIN dmax),
         |hist AS (
         |  SELECT g, k, CAST(SUM(ev) AS BIGINT) AS d,
         |         CAST(COUNT(*) AS BIGINT) AS m
         |  FROM usr GROUP BY 1, 2),
         |users AS (SELECT g, CAST(SUM(m) AS BIGINT) AS nu
         |          FROM hist GROUP BY 1),
         |sp AS (
         |  SELECT k, CAST(SUM(d) AS BIGINT) AS d,
         |         CAST(SUM(CASE WHEN g = 0 THEN d ELSE 0 END) AS BIGINT)
         |           AS d1
         |  FROM hist GROUP BY 1
         |  HAVING SUM(d) > 0),
         |risks AS (
         |  SELECT sp.k AS kk, hist.g, CAST(SUM(hist.m) AS BIGINT) AS nr
         |  FROM hist JOIN sp ON hist.k >= sp.k
         |  GROUP BY 1, 2),
         |terms AS (
         |  SELECT tt.d1, ${LrFormula.e1term8} AS e1t,
         |         ${LrFormula.vterm8} AS vt
         |  FROM (
         |    SELECT sp.k, sp.d, sp.d1,
         |           COALESCE(r1.nr, 0) AS n1k, COALESCE(r2.nr, 0) AS n2k
         |    FROM sp
         |    LEFT JOIN risks r1 ON r1.kk = sp.k AND r1.g = 0
         |    LEFT JOIN risks r2 ON r2.kk = sp.k AND r2.g = 1) tt),
         |agg AS (
         |  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         |         CAST(SUM(CAST(e1t AS DECIMAL(38,8))) AS DECIMAL(38,8))
         |           AS e1s,
         |         CAST(SUM(CAST(vt AS DECIMAL(38,8))) AS DECIMAL(38,8))
         |           AS vs
         |  FROM terms)
         |SELECT u1.nu AS n1_users, u2.nu AS n2_users, agg.o1,
         |       ROUND(CAST(agg.e1s AS DOUBLE), 6) AS e1_6,
         |       ${LrFormula.chi4} AS chi4
         |FROM agg
         |CROSS JOIN (SELECT nu FROM users WHERE g = 0) u1
         |CROSS JOIN (SELECT nu FROM users WHERE g = 1) u2""".stripMargin,

    // same epoch-µs integer lag arithmetic
    "q282_freshness_lag" ->
      """WITH per AS (
        |  SELECT event_type, MAX(ts) AS mx, COUNT(*) AS n_events
        |  FROM events GROUP BY 1),
        |g AS (SELECT MAX(mx) AS gmax FROM per)
        |SELECT per.event_type, per.mx AS last_ts,
        |       (epoch_us(g.gmax) - epoch_us(per.mx)) // 60000000
        |         AS lag_min,
        |       per.n_events
        |FROM per CROSS JOIN g
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,

    "q50_win_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    // Spark aligns sliding windows to the unix epoch: the 4 one-hour
    // windows containing t start at floor15(t) - k*15min, k=0..3.
    "q51_win_sliding" ->
      """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
        |                      - CAST(k AS BIGINT) * 900000000) AS window_start,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) ks
        |GROUP BY 1
        |ORDER BY window_start ASC NULLS FIRST""".stripMargin,

    // Gaps-and-islands: a session breaks when the gap is >= 30 min
    // (session_window's [start, end) is half-open, so an event exactly
    // 30 min after the previous one starts a new session).
    "q52_win_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
        |              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST)
        |), numbered AS (
        |  SELECT user_id, ts,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts,
        |       COUNT(*) AS n_events
        |FROM numbered
        |GROUP BY user_id, sid
        |ORDER BY user_id ASC NULLS FIRST, session_start ASC NULLS FIRST""".stripMargin,

    "q177_rolling_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM ud)
        |SELECT CAST(d.day AS TIMESTAMP) AS day,
        |       COUNT(DISTINCT ud.user_id) AS wau
        |FROM days d JOIN ud ON ud.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day ORDER BY day ASC NULLS FIRST""".stripMargin,

    // the survival replay: identical signup/censor timing, day
    // histogram, window-cumulative risk sets and 8dp-quantized
    // decimal-summed hazard/log-survival terms
    "q265_kaplan_meier" ->
      """WITH s0 AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
        |  WHERE user_id IS NOT NULL AND event_type = 'signup'
        |  GROUP BY 1),
        |ag AS (
        |  SELECT e.user_id, s0.t0,
        |         MIN(CASE WHEN e.event_type = 'purchase'
        |             AND epoch_us(e.ts) > s0.t0
        |             THEN epoch_us(e.ts) END) AS tp,
        |         MAX(epoch_us(e.ts)) AS tmax
        |  FROM events e JOIN s0 USING (user_id)
        |  WHERE e.user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |usr AS (
        |  SELECT CASE WHEN tp IS NOT NULL
        |         THEN (tp - t0) // 86400000000
        |         ELSE (tmax - t0) // 86400000000 END AS k,
        |         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM ag),
        |days AS (
        |  SELECT k, CAST(SUM(ev) AS BIGINT) AS d, COUNT(*) AS m
        |  FROM usr GROUP BY 1),
        |c AS (
        |  SELECT k, d, m,
        |         SUM(m) OVER (ORDER BY k) AS cum,
        |         SUM(m) OVER () AS n
        |  FROM days),
        |ed AS (
        |  SELECT k, d, CAST(n - cum + m AS BIGINT) AS n_risk
        |  FROM c WHERE d > 0),
        |f AS (
        |  SELECT k, d, n_risk,
        |         CASE WHEN d < n_risk THEN
        |           CAST(ROUND(ln(1 - CAST(d AS DOUBLE) / n_risk), 8)
        |                AS DECIMAL(38,8)) END AS f8,
        |         CAST(ROUND(CAST(d AS DOUBLE) / n_risk, 8)
        |              AS DECIMAL(38,8)) AS h8
        |  FROM ed)
        |SELECT k AS day, n_risk, d AS n_events,
        |       ROUND(CAST(SUM(h8) OVER (ORDER BY k) AS DOUBLE), 6)
        |         AS na_cumhaz6,
        |       CASE WHEN d < n_risk THEN
        |         ROUND(CAST(SUM(f8) OVER (ORDER BY k) AS DOUBLE), 6)
        |       END AS km_log_s6
        |FROM f
        |ORDER BY day ASC NULLS FIRST""".stripMargin,

    "q178_time_to_convert" ->
      """WITH s AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'signup'),
        |p AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |conv AS (
        |  SELECT s.user_id, s.ts AS sts, MIN(p.ts) AS pts
        |  FROM s JOIN p ON p.user_id = s.user_id
        |              AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
        |  GROUP BY 1, 2),
        |lat AS (
        |  -- floored microsecond arithmetic, NOT date_diff('second'):
        |  -- date_diff counts boundary crossings, Spark floors the
        |  -- difference — they disagree on sub-second offsets
        |  SELECT CAST(sts AS DATE) AS day,
        |         (epoch_us(pts) - epoch_us(sts)) // 1000000 AS secs
        |  FROM conv),
        |h AS (SELECT day, secs, COUNT(*) AS cnt FROM lat GROUP BY 1, 2),
        |n AS (SELECT day, SUM(cnt) AS n FROM h GROUP BY 1),
        |cum AS (
        |  SELECT day, secs, cnt,
        |         SUM(cnt) OVER (PARTITION BY day ORDER BY secs) AS cc
        |  FROM h)
        |SELECT CAST(cum.day AS TIMESTAMP) AS day,
        |  CAST(MAX(n.n) AS BIGINT) AS n_conv,
        |  MIN(CASE WHEN cc >= (n.n + 1) // 2 THEN secs END) AS p50_secs,
        |  MIN(CASE WHEN cc >= (9 * n.n + 9) // 10 THEN secs END) AS p90_secs
        |FROM cum JOIN n ON n.day = cum.day
        |GROUP BY cum.day ORDER BY day ASC NULLS FIRST""".stripMargin,

    "q179_event_trigrams" ->
      """WITH q AS (
        |  SELECT event_type AS t1,
        |    LEAD(event_type, 1) OVER w AS t2,
        |    LEAD(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST))
        |SELECT t1, t2, t3, COUNT(*) AS cnt FROM q
        |WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY cnt DESC, t1 ASC, t2 ASC, t3 ASC LIMIT 15""".stripMargin,

    "q211_dow_hour" ->
      """WITH cells AS (
        |  SELECT ((CAST(ts AS DATE) - DATE '1970-01-01') + 3) % 7 AS dow,
        |         CAST(hour(ts) AS INT) AS hod, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT SUM(n) AS tot FROM cells)
        |SELECT CAST(dow AS INT) AS dow, hod, CAST(n AS BIGINT) AS n,
        |       ROUND(CAST(n AS DOUBLE) / tot, 6) AS share6
        |FROM cells CROSS JOIN tot
        |ORDER BY dow ASC NULLS FIRST, hod ASC NULLS FIRST""".stripMargin
  )
}
