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
        .orderBy("user_id", "session_start"))
  )

  val oracle: Map[String, String] = Map(
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
        |ORDER BY user_id ASC NULLS FIRST, session_start ASC NULLS FIRST""".stripMargin
  )
}
