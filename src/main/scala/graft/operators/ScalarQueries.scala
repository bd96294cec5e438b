package graft.operators

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.8 scalar function families q40–q42 + §2.3 temporal joins q17–q19.
  *
  * Scale notes: all scalar projections stay inside whole-stage codegen
  * (built-in functions only, no UDFs). q17's interval join is an equi-join
  * on user_id with the time-range predicate as a post-join filter — the
  * shuffle key is the user, so it scales with user cardinality, not with
  * the cross product. q18's as-of join is the union-tag + running `last()`
  * window form: one shuffle by user, one in-partition sort, no per-row
  * subquery.
  */
object ScalarQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_datetime" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          tsOut(date_trunc("month", col("o_orderdate"))).as("order_month"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          tsOut(col("o_orderdate") + expr("INTERVAL 3 MONTH")).as("plus3"),
          datediff(lit("2000-01-01").cast("timestamp"), col("o_orderdate"))
            .as("days_to_y2k"))
        .orderBy("o_orderkey")),

    "q41_math" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_disc_shift"),
          (col("l_quantity") % 7.0).as("qty_mod"),
          round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
          round(log(col("l_extendedprice")), 4).as("ln_price"),
          round(pow(col("l_quantity"), 1.5), 4).as("qty_pow"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Leading elements emitted as float scalar columns (bit-exact across
    // engines) rather than an array cell the driver's hash may render
    // engine-specifically.
    "q42_array_ops" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("n_dims"),
          // try_element_at: ANSI element_at throws on arrays shorter than
          // the index; NULL here matches DuckDB's list[i] on short lists
          try_element_at(col("embedding"), lit(1)).as("e1"),
          try_element_at(col("embedding"), lit(2)).as("e2"),
          try_element_at(col("embedding"), lit(3)).as("e3"),
          // graft_dot(e, e) is the same left-to-right Σx² fold as the
          // aggregate-lambda form, but codegen'd
          round(sqrt(expr("graft_dot(embedding, embedding)")), 4)
            .as("l2_norm"))
        .orderBy("vec_id")),

    // Routed through the streaming module's interval join: the SAME code
    // runs as a stream-stream join (watermark-bounded state) and as this
    // batch query (watermarks are batch no-ops) — StreamingSpec asserts
    // the streamed results converge to this oracle-gated batch output.
    "q17_join_range" -> ((s, dir) => {
      val e = t(s, dir, "events")
      graft.streaming.EventStreams.attributionJoin(
        e.filter(col("event_type") === "signup"),
        e.filter(col("event_type") === "purchase"))
        .orderBy("signup_id", "purchase_id")
    }),

    "q18_join_asof" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // Purchases sort before clicks at equal ts (tag 0 < tag 1), so the
      // strictly-preceding frame never sees an equal-ts click — exactly
      // the `c.ts < p.ts` semantics of the correlated oracle.
      val e = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("tag", when(col("event_type") === "purchase", 0)
          .otherwise(1))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("tag").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("last_click_ts",
          last(when(col("tag") === 1, col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          tsOut(col("ts")).as("purchase_ts"),
          tsOut(col("last_click_ts")).as("last_click_ts"))
        .orderBy("event_id")
    }),

    "q19_subquery_corr" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val nav = c.groupBy(col("c_nationkey").as("nk"))
        .agg((decSum(col("c_acctbal")).cast("double") / count(lit(1)))
          .as("nation_avg"))
      c.join(nav, col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"),
          col("nation_avg"))
        .orderBy("c_custkey")
    }),

    // Higher-order array-function family — transform/filter/exists/
    // forall/aggregate/slice over the token array, each inside ONE
    // projection. These are the array-lambda verbs a pipeline uses for
    // in-row work that would otherwise explode+reaggregate (a shuffle);
    // the HOF forms are flat maps. Lambdas evaluate interpreted — fine
    // here (no join fan-out multiplies the rows); the codegen kernels
    // (graft_*) exist for the hot paths that do.
    "q214_hof_family" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks",
          graft.functions.TextFunctions.tokens(col("text")))
        .select(col("doc_id"),
          expr("size(filter(toks, t -> length(t) > 4))").as("n_long"),
          expr("exists(toks, t -> t = 'hash')").as("has_hash"),
          expr("forall(toks, t -> length(t) < 12)").as("all_short"),
          expr("aggregate(toks, CAST(0 AS BIGINT), " +
            "(a, t) -> a + length(t))").as("sum_len"),
          expr("array_join(slice(toks, 1, 3), ' ')").as("first3"))
        .orderBy("doc_id")),

    // Cryptographic-hash function family (MD5 / SHA-256 — the Redshift
    // checksum/distribution-key builtins): every hex digest is gated
    // exactly through min-string picks and polynomial charhash sums, so
    // one wrong byte in any digest breaks the hash. Pure projections,
    // map-side-combinable rollup.
    "q223_hash_funcs" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_mktsegment"),
          md5(col("c_name")).as("h_md5"),
          sha2(col("c_name"), 256).as("h_sha"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          min(col("h_md5")).as("md5_min"),
          sum(expr("graft_charhash(h_md5)")).as("md5_hsum"),
          min(col("h_sha")).as("sha_min"),
          sum(expr("graft_charhash(h_sha)")).as("sha_hsum"))
        .orderBy("c_mktsegment")),

    // String scalar-function family (TRANSLATE / STRPOS / SPLIT_PART /
    // LPAD / REVERSE / REPEAT / TRIM) — each Redshift string builtin
    // exercised inside one codegen'd projection, gated through an
    // integer rollup so any off-by-one (1-based STRPOS, pad-to-width
    // semantics, trim charset) breaks the hash.
    "q190_string_funcs" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(length(translate(col("c_name"), "#0123456789", "")))
            .as("sum_alpha"),
          sum(instr(col("c_name"), "#")).as("sum_haspos"),
          sum(length(lpad(split_part(col("c_name"), lit("#"), lit(2)),
            12, "0"))).as("sum_pad"),
          sum(when(reverse(col("c_name")).like("1%"), 1L).otherwise(0L))
            .as("n_rev1"),
          sum(length(trim(repeat(substring(col("c_name"), 1, 2), 3))))
            .as("sum_rep"))
        .orderBy("c_mktsegment")),

    // Conditional / null-handling family (NULLIF / COALESCE / NVL2 /
    // GREATEST / LEAST). nvl2 runs natively on the Spark side; the
    // oracle replays it as the equivalent CASE — the gate is semantic,
    // not syntactic.
    "q191_null_funcs" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
          sum(when(nullif(col("c_nationkey"), lit(0)).isNull, 1L)
            .otherwise(0L)).as("n_nation0"),
          sum((coalesce(nullif(col("c_acctbal"), lit(0.0)), lit(-1.0))
            < 0).cast("int")).as("n_nonpos"),
          sum(greatest(col("c_nationkey"), lit(12))).as("sum_great"),
          sum(least(col("c_nationkey"), lit(12))).as("sum_least"),
          sum(expr("nvl2(c_acctbal, c_nationkey, -1)")).as("sum_nvl2"))
        .orderBy("c_mktsegment")),

    // Date scalar-function family (QUARTER / DATE_TRUNC('quarter') /
    // LAST_DAY / DAYOFYEAR / first-of-month predicate) over the order
    // calendar — quarter boundaries and month-end arithmetic are where
    // engine date kernels habitually disagree; the rollup pins them.
    "q192_date_funcs" -> ((s, dir) => {
      val d = to_date(col("o_orderdate"))
      t(s, dir, "orders")
        .groupBy(year(d).as("yr"), quarter(d).as("q"))
        .agg(count(lit(1)).as("n"),
          tsOut(min(to_date(date_trunc("quarter", d))).cast("timestamp"))
            .as("q_start"),
          tsOut(max(last_day(d)).cast("timestamp")).as("month_end_max"),
          sum(dayofyear(d)).as("sum_doy"),
          sum(when(d === to_date(date_trunc("month", d)), 1L)
            .otherwise(0L)).as("n_first_of_month"))
        .orderBy("yr", "q")
    })
  )

  val oracle: Map[String, String] = Map(
    "q40_datetime" ->
      """SELECT o_orderkey,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
        |         AS order_month,
        |       CAST(date_part('year', o_orderdate) AS INT) AS o_year,
        |       CAST(date_part('month', o_orderdate) AS INT) AS o_month,
        |       CAST(date_part('day', o_orderdate) AS INT) AS o_day,
        |       o_orderdate + INTERVAL 3 MONTH AS plus3,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "q41_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       ABS(l_discount - 0.05) AS abs_disc_shift,
        |       l_quantity % 7.0 AS qty_mod,
        |       ROUND(SQRT(l_extendedprice), 4) AS sqrt_price,
        |       ROUND(LN(l_extendedprice), 4) AS ln_price,
        |       ROUND(POWER(l_quantity, 1.5), 4) AS qty_pow
        |FROM lineitem
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin,

    "q42_array_ops" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS INT) AS n_dims,
        |       embedding[1] AS e1, embedding[2] AS e2, embedding[3] AS e3,
        |       ROUND(SQRT(list_sum(list_transform(embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
        |FROM embeddings ORDER BY vec_id ASC NULLS FIRST""".stripMargin,

    "q17_join_range" ->
      """SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
        |       s.user_id, s.ts AS signup_ts, p.ts AS purchase_ts
        |FROM events s JOIN events p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        |WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
        |ORDER BY signup_id ASC NULLS FIRST, purchase_id ASC NULLS FIRST""".stripMargin,

    "q18_join_asof" ->
      """SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
        |       (SELECT max(c.ts) FROM events c
        |        WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |          AND c.ts < p.ts) AS last_click_ts
        |FROM events p
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id ASC NULLS FIRST""".stripMargin,

    "q19_subquery_corr" ->
      """SELECT c.c_custkey, c.c_acctbal, c.c_nationkey, nav.nation_avg
        |FROM customer c
        |JOIN (SELECT c_nationkey,
        |             CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS nation_avg
        |      FROM customer GROUP BY c_nationkey) nav
        |  ON c.c_nationkey = nav.c_nationkey
        |WHERE c.c_acctbal > nav.nation_avg
        |ORDER BY c.c_custkey ASC NULLS FIRST""".stripMargin,

    "q190_string_funcs" ->
      """SELECT c_mktsegment,
        |  COUNT(*) AS n,
        |  CAST(SUM(length(translate(c_name, '#0123456789', '')))
        |    AS BIGINT) AS sum_alpha,
        |  CAST(SUM(strpos(c_name, '#')) AS BIGINT) AS sum_haspos,
        |  CAST(SUM(length(lpad(split_part(c_name, '#', 2), 12, '0')))
        |    AS BIGINT) AS sum_pad,
        |  CAST(SUM(CASE WHEN reverse(c_name) LIKE '1%' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_rev1,
        |  CAST(SUM(length(trim(repeat(substr(c_name, 1, 2), 3))))
        |    AS BIGINT) AS sum_rep
        |FROM customer GROUP BY 1
        |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin,

    "q191_null_funcs" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CASE WHEN NULLIF(c_nationkey, 0) IS NULL
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_nation0,
        |  CAST(SUM(CAST(COALESCE(NULLIF(c_acctbal, 0.0), -1.0) < 0
        |    AS INT)) AS BIGINT) AS n_nonpos,
        |  CAST(SUM(GREATEST(c_nationkey, 12)) AS BIGINT) AS sum_great,
        |  CAST(SUM(LEAST(c_nationkey, 12)) AS BIGINT) AS sum_least,
        |  CAST(SUM(CASE WHEN c_acctbal IS NOT NULL THEN c_nationkey
        |                ELSE -1 END) AS BIGINT) AS sum_nvl2
        |FROM customer GROUP BY 1
        |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin,

    "q192_date_funcs" ->
      """SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS q,
        |  COUNT(*) AS n,
        |  CAST(MIN(CAST(date_trunc('quarter', CAST(o_orderdate AS DATE))
        |    AS DATE)) AS TIMESTAMP) AS q_start,
        |  CAST(MAX(last_day(CAST(o_orderdate AS DATE))) AS TIMESTAMP)
        |    AS month_end_max,
        |  CAST(SUM(dayofyear(CAST(o_orderdate AS DATE))) AS BIGINT)
        |    AS sum_doy,
        |  CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) =
        |      CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_first_of_month
        |FROM orders GROUP BY 1, 2
        |ORDER BY yr ASC NULLS FIRST, q ASC NULLS FIRST""".stripMargin,

    "q223_hash_funcs" -> {
      val hm = graft.functions.TextFunctions.Sql.charHash("h_md5")
      val hs = graft.functions.TextFunctions.Sql.charHash("h_sha")
      """WITH h AS (
        |  SELECT c_mktsegment, md5(c_name) AS h_md5,
        |         sha256(c_name) AS h_sha
        |  FROM customer)
        |SELECT c_mktsegment, COUNT(*) AS n,
        |  MIN(h_md5) AS md5_min, CAST(SUM(HM) AS BIGINT) AS md5_hsum,
        |  MIN(h_sha) AS sha_min, CAST(SUM(HS) AS BIGINT) AS sha_hsum
        |FROM h GROUP BY 1
        |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin
        .replace("HM", hm).replace("HS", hs)
    },

    "q214_hof_family" -> {
      val toks = graft.functions.TextFunctions.Sql.tokens("text")
      s"""WITH tk AS (SELECT doc_id, $toks AS toks FROM documents)
         |SELECT doc_id,
         |  CAST(len(list_filter(toks, t -> length(t) > 4)) AS INT)
         |    AS n_long,
         |  list_contains(toks, 'hash') AS has_hash,
         |  len(list_filter(toks, t -> length(t) >= 12)) = 0 AS all_short,
         |  CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
         |       AS BIGINT) AS sum_len,
         |  array_to_string(toks[1:3], ' ') AS first3
         |FROM tk ORDER BY doc_id ASC NULLS FIRST""".stripMargin
    }
  )
}
