package graft.operators

import java.sql.Timestamp

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** q243's templated ANSI SQL — the reference's ACTUAL interface (it
    * interpolates request parameters into SQL and pushes the string to
    * the warehouse; here Catalyst is the warehouse). Written in the
    * portable dialect subset, so the IDENTICAL string runs on Spark
    * (over [[graft.Tables.registerViews]]) and as the DuckDB oracle —
    * the strongest possible gate: no translation layer at all. The
    * decimal-staged revenue sum is the [D2] convention spelled in
    * plain SQL. */
  private[graft] val SqlTemplate: String =
    """SELECT c.c_mktsegment, n.n_name,
      |       COUNT(DISTINCT o.o_orderkey) AS n_orders,
      |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
      |         AS revenue
      |FROM orders o
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY c.c_mktsegment, n.n_name
      |ORDER BY c.c_mktsegment ASC NULLS FIRST, n.n_name ASC NULLS FIRST"""
      .stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The SQL-template endpoint — the reference's interface verbatim:
    // register the lake tables as views and run the templated ANSI
    // string through spark.sql; the oracle is the SAME string, so the
    // gate has zero translation surface. Catalyst still plans it like
    // any DataFrame query (range predicate pushes to the orders scan,
    // dims broadcast).
    "q243_sql_template" -> ((s, dir) => {
      graft.Tables.registerViews(s, dir)
      s.sql(SqlTemplate)
    }),

    // Right-to-be-forgotten deletion-propagation audit — the ETL
    // service op behind a deletion-request batch: given the request
    // roster (modeled as the deterministic key slice custkey % 97 = 0,
    // and user_id % 97 = 0 on the event log's separate keyspace),
    // report per table how many rows and distinct subjects a purge
    // would touch and the exact revenue cents leaving the books — the
    // manifest a compliance run signs off BEFORE any destructive
    // delete. Scale shape: the roster is request-sized, broadcast
    // into the fact joins (orders, then lineitem through the order
    // keys); each table contributes ONE agg row; no fact-side shuffle
    // beyond the broadcast probes.
    "q388_deletion_audit" -> ((s, dir) => {
      val roster = t(s, dir, "customer")
        .filter(pmod(col("c_custkey"), lit(97L)) === 0L)
        .select(col("c_custkey"))
      val co = t(s, dir, "orders").join(broadcast(roster),
        col("o_custkey") === col("c_custkey"))
      def row(tbl: String, d: DataFrame): DataFrame =
        d.select(lit(tbl).as("tbl"), col("n_del_keys"),
          col("n_rows"), coalesce(col("purge_cents"), lit(0L))
            .as("purge_cents"))
      val cust = roster.agg(count(lit(1)).as("n_del_keys"),
        count(lit(1)).as("n_rows"),
        sum(lit(0L)).as("purge_cents"))
      val ords = co.agg(countDistinct(col("o_custkey")).as("n_del_keys"),
        count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("purge_cents"))
      val li = t(s, dir, "lineitem")
        .join(broadcast(co.select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .agg(countDistinct(col("o_custkey")).as("n_del_keys"),
          count(lit(1)).as("n_rows"),
          sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("purge_cents"))
      val ev = t(s, dir, "events")
        .filter(pmod(col("user_id"), lit(97L)) === 0L)
        .agg(countDistinct(col("user_id")).as("n_del_keys"),
          count(lit(1)).as("n_rows"),
          sum(round(col("value") * 100).cast("long")).as("purge_cents"))
      row("customer", cust).unionByName(row("events", ev))
        .unionByName(row("lineitem", li)).unionByName(row("orders", ords))
        .orderBy("tbl")
    }),

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
    }),

    // Ranked-list endpoint: top-25 customers by order value in the range,
    // ranked through the bounded-heap top-k operator (k rows cross the
    // exchange, never a full sort).
    "q86_svc_topcust" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.topCustomers(t(s, dir, "orders"), t(s, dir, "customer"),
        From, Until, k = 25)
    }),

    // Operational-metrics endpoint: hourly event activity in a ten-day
    // window, no type filter (exercises the absent-parameter path).
    "q87_svc_activity" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.eventActivity(t(s, dir, "events"),
        utcTs("2024-01-10T00:00:00"), utcTs("2024-01-20T00:00:00"))
        .select(Dets.tsOut(col("hour")).as("hour"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // Supply-side endpoint: per-nation supplier revenue/quantity for a
    // year of ship dates, dims broadcast.
    "q88_svc_supplier" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.supplierRevenue(t(s, dir, "lineitem"), t(s, dir, "supplier"),
        t(s, dir, "nation"),
        utcTs("1996-01-01T00:00:00"), utcTs("1997-01-01T00:00:00"))
    }),

    // Category-mix endpoint: revenue share by part type across a year of
    // ship dates (exact decimal share, one double division at the end).
    "q89_svc_partshare" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.partTypeShare(t(s, dir, "lineitem"), t(s, dir, "part"),
        utcTs("1995-06-01T00:00:00"), utcTs("1996-06-01T00:00:00"))
    }),

    // Retrieval endpoint: hybrid BM25 ⊕ dense-cosine search with a
    // DIFFERENT parameter binding than q115 (term bag, probe, depth,
    // k), proving the endpoint parameterization under the same gate.
    "q117_svc_search" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.searchDocuments(
        Tables.loadSpread(s, dir, "documents"),
        Tables.loadSpread(s, dir, "embeddings"),
        SearchTerms, probeId = SearchProbe, depth = SearchDepth,
        k = SearchK, rrfK = SearchRrfK)
    }),

    // Data-quality endpoint: referential-integrity audit across the
    // relational lake — per-check violating-row counts via anti joins
    // (dims broadcast; the fact-sized checks shuffle 8-byte keys only).
    "q126_integrity_audit" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.integrityAudit(t(s, dir, "orders"), t(s, dir, "lineitem"),
        t(s, dir, "customer"), t(s, dir, "part"), t(s, dir, "supplier"))
    }),

    // Multi-dimensional reporting endpoint: part-type market share by
    // (customer region, order year) over a two-year range — one
    // fact-fact key shuffle, dims broadcast, share windowed over
    // dimension-bounded post-aggregation rows.
    "q127_svc_marketshare" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.marketShare(t(s, dir, "lineitem"), t(s, dir, "orders"),
        t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region"),
        t(s, dir, "part"),
        utcTs("1995-01-01T00:00:00"), utcTs("1997-01-01T00:00:00"))
    }),

    // Returned-items report (TPC-H Q10 shape): top-20 customers by
    // revenue lost to l_returnflag = 'R' lines in the 1995 order year —
    // both filters pushed to the fact scans, bounded-heap ranking,
    // dims joined after the cut.
    "q128_svc_returns" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.returnedItems(t(s, dir, "lineitem"), t(s, dir, "orders"),
        t(s, dir, "customer"), t(s, dir, "nation"), From, Until, k = 20)
    }),

    // CDC MERGE apply: the latest event per user becomes an upsert
    // (or, for 'error' finals, a delete) against the customer snapshot
    // keyed on custkey — one full-outer key join, no window in the
    // apply itself, op decided by codegen projections.
    "q136_cdc_merge" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val changes = t(s, dir, "events")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("user_id").as("c_custkey"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          concat(lit("user_"), col("user_id").cast("string")).as("c_name"),
          col("value").as("c_acctbal"))
      svc.applyChanges(
          t(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal"),
          changes, "c_custkey", Seq("c_name", "c_acctbal"))
        .orderBy("c_custkey")
    }),

    // SCD Type-2 dimension build: the events feed as a change stream —
    // each user's observed states become validity intervals (version,
    // valid_from, valid_to, is_current), ties sequenced on event_id so
    // replays version identically. One keyed window, no joins.
    "q135_scd2_history" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      svc.scdHistory(t(s, dir, "events"), "user_id", "ts", "event_id",
          Seq("event_type", "value"))
        .orderBy("user_id", "version")
    }),

    // Data-quality check suite AS DATA — the dbt-test /
    // great-expectations analog every warehouse load runs before
    // publishing: each assertion is one aggregate emitting
    // (check_name, n_violations, n_total, rate), so the QA report is
    // itself a queryable relation (and a zero-violation check is a
    // ROW saying so, not an absence). Five checks: null keys,
    // referential orphans (anti-join count), primary-key duplicates
    // (count − distinct count), domain violations, future-dated rows.
    // Each check is one map-side-combinable pass over its table; the
    // orphan check's anti join is the only shuffle and it ships keys
    // only. Zero-violation rows are the fixture's health certificate.
    "q281_dq_checks" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val part = t(s, dir, "part")
      def check(name: String, viol: DataFrame => org.apache.spark.sql.Column,
        src: DataFrame): DataFrame =
        src.agg(viol(src).as("n_violations"),
            count(lit(1)).as("n_total"))
          .select(lit(name).as("check_name"), col("n_violations"),
            col("n_total"),
            round(col("n_violations").cast("double") / col("n_total"), 4)
              .as("rate4"))
      val nullKeys = check("events_user_id_null",
        _ => sum(when(col("user_id").isNull, 1L).otherwise(0L)), ev)
      val orphans = check("lineitem_orphan_orderkey",
        _ => sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)),
        li.select("l_orderkey")
          .join(ord.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left"))
      val pkDup = li.agg(count(lit(1)).as("n_total"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("nd"))
        .select(lit("lineitem_pk_duplicate").as("check_name"),
          (col("n_total") - col("nd")).as("n_violations"), col("n_total"),
          round((col("n_total") - col("nd")).cast("double")
            / col("n_total"), 4).as("rate4"))
      val domain = check("part_retailprice_nonpositive",
        _ => sum(when(col("p_retailprice") <= 0, 1L).otherwise(0L)), part)
      val future = check("orders_future_date",
        _ => sum(when(col("o_orderdate") > lit("2026-01-01"), 1L)
          .otherwise(0L)), ord)
      nullKeys.unionByName(orphans).unionByName(pkDup)
        .unionByName(domain).unionByName(future)
        .orderBy("check_name")
    }),

    // Point-in-time (as-of) dimension lookup — the feature-store join
    // that makes the q135 SCD2 history USEFUL and leak-free: for each
    // weekly snapshot date, each user's dimension version in effect
    // (the state strictly as-of that date — never a later version, the
    // label-leakage guarantee training pipelines need). Formulated as
    // argmax(version | valid_from <= snapshot) — equivalent to the
    // validity-interval predicate because versions are sequential, and
    // it sidesteps NULL valid_to handling entirely. Scale shape: the
    // 4-row calendar broadcasts into the dim (documented bounded
    // cross), one (snapshot, user) argmax agg — the dim never
    // self-joins; users whose first version postdates a snapshot are
    // absent from that snapshot by construction.
    "q274_pit_join" -> ((s, dir) => {
      val svc = new graft.api.EtlService(s)
      val dim = svc.scdHistory(t(s, dir, "events"), "user_id", "ts",
        "event_id", Seq("event_type", "value"))
      val snaps = s.range(1).select(explode(expr(
        "array(timestamp_ntz'2024-01-08 00:00:00'," +
          " timestamp_ntz'2024-01-15 00:00:00'," +
          " timestamp_ntz'2024-01-22 00:00:00'," +
          " timestamp_ntz'2024-01-29 00:00:00')")).as("snap_ts"))
      dim.crossJoin(broadcast(snaps))
        .filter(col("valid_from") <= col("snap_ts"))
        .groupBy("snap_ts", "user_id")
        .agg(max(struct(col("version"), col("event_type").as("et"),
          col("value").as("v"))).as("a"))
        .select(col("snap_ts"), col("user_id"),
          col("a.version").as("version"), col("a.et").as("event_type"),
          col("a.v").as("value"))
        .orderBy("snap_ts", "user_id")
    }),

    // Fulfillment-SLA endpoint: order-to-ship latency percentiles
    // (exact p50/p90/p99 days) per order priority. The join ships only
    // the two date columns + keys; percentiles run through the q44
    // value-histogram + distributed cumSum — latency's value domain is
    // a few thousand distinct day counts, so the histogram collapses
    // the lineitem-sized relation to a tiny one before any windowing,
    // at every scale [D2].
    "q180_ship_sla" -> ((s, dir) => {
      val lat = t(s, dir, "lineitem")
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority").as("pri"),
            to_date(col("o_orderdate")).as("od")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("pri"), datediff(col("ship"), col("od")).as("days"))
      val hist = lat.groupBy("pri", "days").agg(count(lit(1)).as("cnt"))
      graft.functions.GlobalRank.cumSum(hist, "pri", "days", "cnt")
        .groupBy("pri")
        .agg(max(col("n")).as("n_lines"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("days")))
            .as("p50_days"),
          min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("days")))
            .as("p90_days"),
          min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("days")))
            .as("p99_days"))
        .orderBy("pri")
    }),

    // Local-supplier revenue (the TPC-H Q5 topology): revenue per nation
    // where the LINE's supplier sits in the ordering customer's nation —
    // the one star query whose join graph is CYCLIC (the
    // c_nationkey = s_nationkey edge closes the loop), so the optimizer
    // must carry the supplier join as a composite-key equi-join instead
    // of a star fan-out. Dims broadcast; the fact side shuffles only on
    // the natural orderkey/suppkey keys. Region + year filters push into
    // the joins.
    "q213_local_supplier_rev" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(Dets.decSumD(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("nation").asc)
    }),

    // Price-index report between two pinned years (1996 base → 2000
    // current) over the parts traded in BOTH — Laspeyres (base-
    // quantity weights), Paasche (current weights), and Fisher's
    // ideal geometric mean (all public textbook index-number theory):
    // the deflator a revenue dashboard needs before comparing years.
    // Per (part, year) quantity and revenue collapse exactly (integer
    // quantities, integer cents); the two cross-weighted sums whose
    // unit prices are rationals (p₁q₀ = v₁q₀/q₁, p₀q₁ = v₀q₁/q₀)
    // stage as 6dp-quantized doubles decimal-summed [D2], while
    // Σp₀q₀ = Σv₀ and Σp₁q₁ = Σv₁ stay exact integers; the three
    // indexes are shared-string IEEE trees (PriceIndexFormula). One
    // scan + one self-equi-join on the part dimension.
    "q345_price_index" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), year(col("l_shipdate")).as("yr"),
          col("l_quantity").cast("long").as("q"),
          round(col("l_extendedprice") * 100).cast("long").as("v"))
        .filter(col("yr") === PiBaseYear || col("yr") === PiCurYear)
        .groupBy("l_partkey", "yr")
        .agg(sum(col("q")).as("q"), sum(col("v")).as("v"))
      val b = li.filter(col("yr") === PiBaseYear)
        .select(col("l_partkey"), col("q").as("q0"), col("v").as("v0"))
      val c = li.filter(col("yr") === PiCurYear)
        .select(col("l_partkey"), col("q").as("q1"), col("v").as("v1"))
      b.join(c, Seq("l_partkey"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("v0")).as("s_v0"), sum(col("v1")).as("s_v1"),
          sum(round(col("v1").cast("double") * col("q0").cast("double")
            / col("q1").cast("double"), 6).cast(Dets.Dec)).as("s_lnum"),
          sum(round(col("v0").cast("double") * col("q1").cast("double")
            / col("q0").cast("double"), 6).cast(Dets.Dec)).as("s_pden"))
        .select(col("n_parts"),
          expr(PriceIndexFormula.las4).as("laspeyres4"),
          expr(PriceIndexFormula.paa4).as("paasche4"),
          expr(PriceIndexFormula.fis4).as("fisher4"))
    }),

    // Törnqvist price index (Törnqvist 1936, public index-number
    // theory) over the same matched (part, base-year, current-year)
    // panel as q345 — the superlative index the q345 family still
    // lacked (Fisher is the geometric mean of Laspeyres/Paasche;
    // Törnqvist weights each part's log price relative by its AVERAGE
    // expenditure share, the other standard superlative — the two
    // agreeing is the index-number health check): ln P_T = Σ_i
    // ½(v0/V0 + v1/V1)·ln(v1·q0/(v0·q1)). Per-part exact integer
    // (q, v) collapses first; matched-panel totals attach via ONE
    // broadcast row; per-part terms 8dp-quantized + decimal-summed
    // [D2]; the index is one exp at the end. Same scan + dim-join
    // shape as q345.
    "q364_tornqvist" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), year(col("l_shipdate")).as("yr"),
          col("l_quantity").cast("long").as("q"),
          round(col("l_extendedprice") * 100).cast("long").as("v"))
        .filter(col("yr") === PiBaseYear || col("yr") === PiCurYear)
        .groupBy("l_partkey", "yr")
        .agg(sum(col("q")).as("q"), sum(col("v")).as("v"))
      val b = li.filter(col("yr") === PiBaseYear)
        .select(col("l_partkey"), col("q").as("q0"), col("v").as("v0"))
      val c = li.filter(col("yr") === PiCurYear)
        .select(col("l_partkey"), col("q").as("q1"), col("v").as("v1"))
      val m = b.join(c, Seq("l_partkey"))
      val tot = m.agg(sum(col("v0")).as("tv0"), sum(col("v1")).as("tv1"))
      m.crossJoin(broadcast(tot))
        .withColumn("t8", round(
          (col("v0").cast("double") / col("tv0").cast("double")
            + col("v1").cast("double") / col("tv1").cast("double"))
            * log(col("v1").cast("double") * col("q0").cast("double")
              / (col("v0").cast("double") * col("q1").cast("double")))
            / 2.0, 8).cast("decimal(38,8)"))
        .agg(count(lit(1)).as("n_parts"), sum(col("t8")).as("s_t"))
        .select(col("n_parts"),
          round(col("s_t").cast("double"), 6).as("ln_t6"),
          round(exp(col("s_t").cast("double")), 4).as("tornqvist4"))
    }),

    // Incremental aggregate maintenance — the nightly-ETL shape the
    // reference's COPY-then-transform flow implies at 100 TB: the
    // monthly revenue rollup maintained as BASE partial + DELTA
    // partial merged by outer-join sum (scan only the increment, never
    // the history), hash-gated against the oracle's single-pass direct
    // aggregation — the merge-of-partials ≡ direct-recompute identity
    // is exactly what makes the incremental plan trustworthy. The
    // base/delta split is the seeded polyMix parity of the order key
    // [D1] (the q315 convention), so the verdict is a pure function of
    // the data.
    "q369_agg_maintenance" -> ((s, dir) => {
      val hm = GraphQueries.HashM
      val o = t(s, dir, "orders")
        .withColumn("flag", pmod(GraphQueries.polyMix(
          pmod(col("o_orderkey"), lit(hm))), lit(2L)))
        .withColumn("month", date_trunc("month", col("o_orderdate")))
        .withColumn("cents",
          round(col("o_totalprice") * 100).cast("long"))
      def partial(f: Long, n: String, c: String) =
        o.filter(col("flag") === f).groupBy("month")
          .agg(count(lit(1)).as(n), sum(col("cents")).as(c))
      partial(0L, "n_base", "c_base")
        .join(partial(1L, "n_delta", "c_delta"), Seq("month"),
          "full_outer")
        .select(Dets.tsOut(col("month")).as("month"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_delta"), lit(0L)).as("n_delta"),
          (coalesce(col("n_base"), lit(0L))
            + coalesce(col("n_delta"), lit(0L))).as("n_orders"),
          (coalesce(col("c_base"), lit(0L))
            + coalesce(col("c_delta"), lit(0L))).as("revenue_cents"))
        .orderBy("month")
    }),

    // Join-key skew audit — the pre-join diagnostic an engineer runs
    // BEFORE deciding to salt (SURVEY §2's skew note made a measured
    // report): per-part fact-row counts collapsed to a count-of-counts
    // histogram, then exact p50/p99/max by RANK from the distributed
    // cumSum (q44's machinery — no global sort), the [D5]
    // integer-staged mean, and the max/mean skew factor that says
    // whether the straggler task exists. One keyed agg + one bounded
    // histogram pass at any fact size.
    "q376_join_skew_audit" -> ((s, dir) => {
      val perKey = t(s, dir, "lineitem").groupBy("l_partkey")
        .agg(count(lit(1)).as("c"))
      val h = perKey.groupBy("c").agg(count(lit(1)).as("cnt"))
        .withColumn("gg", lit(1))
      val cum = graft.functions.GlobalRank.cumSum(h, "gg", "c", "cnt")
      cum.agg(max(col("n")).as("n_keys"),
          sum(col("c") * col("cnt")).as("n_rows"),
          min(when(col("cum") * 2 >= col("n"), col("c"))).as("p50_rows"),
          min(when(col("cum") * 100 >= col("n") * 99, col("c")))
            .as("p99_rows"),
          max(col("c")).as("max_rows"))
        .select(col("n_keys"), col("n_rows"),
          (expr("(2 * n_rows * 10000 + n_keys) div (2 * n_keys)")
            .cast("double") / 10000.0).as("mean_rows4"),
          col("p50_rows"), col("p99_rows"), col("max_rows"),
          round(col("max_rows").cast("double")
            * col("n_keys").cast("double")
            / col("n_rows").cast("double"), 4).as("skew4"))
    }),

    // Safety-stock / reorder-point report per part type — the
    // z-service-level closed form (public inventory theory): daily
    // demand mean and sd from exact integer quantities, safety stock
    // z₀.₉₅·σ and the one-day-lead reorder point μ + z·σ — the
    // inventory dashboard next to q345's deflator and q161's ABC
    // classes. One fact scan + one part-dim broadcast join + two
    // keyed aggs (daily histogram, then exact moments); mean [D5]
    // integer-staged; sd/safety/reorder shared-string trees
    // (StockFormula) with the z constant a shortest-roundtrip double
    // literal.
    "q354_safety_stock" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val daily = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey").as("l_partkey"), col("p_type"))),
          Seq("l_partkey"))
        .groupBy(col("p_type"),
          date_trunc("day", col("l_shipdate")).as("day"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      daily.groupBy("p_type").agg(count(lit(1)).as("n_days"),
          sum(col("q")).as("s1"), sum(d38(col("q")) * col("q")).as("s2"))
        .select(col("p_type"), col("n_days"), col("s1").as("total_qty"),
          (expr("(2 * s1 * 10000 + n_days) div (2 * n_days)")
            .cast("double") / 10000.0).as("mean4"),
          expr(StockFormula.sd4).as("sd4"),
          expr(StockFormula.safety4).as("safety4"),
          expr(StockFormula.rop4).as("rop4"))
        .orderBy("p_type")
    })
  )

  /** q354's inventory trees over the exact daily-demand moments
    * (n_days, s1 = Σq, s2 = Σq²) — shared text, one IEEE tree each;
    * z₀.₉₅ pre-evaluated to a shortest-roundtrip double literal. NULL
    * below two observed days (sample sd undefined). */
  private[operators] object StockFormula {
    private val Z95 = "1.6448536269514722E0"
    private val n = "CAST(n_days AS DOUBLE)"
    private val mean = s"(CAST(s1 AS DOUBLE) / $n)"
    private val sd = s"sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) " +
      s"* CAST(s1 AS DOUBLE) / $n) / ($n - 1.0))"
    val sd4: String = s"CASE WHEN n_days > 1 THEN round($sd, 4) END"
    val safety4: String =
      s"CASE WHEN n_days > 1 THEN round($Z95 * $sd, 4) END"
    val rop4: String =
      s"CASE WHEN n_days > 1 THEN round($mean + $Z95 * $sd, 4) END"
  }

  /** q345's pinned comparison years. */
  private val PiBaseYear = 1996
  private val PiCurYear = 2000

  /** q345's index trees over the exact/quantized sums (s_v0 = Σp₀q₀,
    * s_v1 = Σp₁q₁ exact cents; s_lnum = Σp₁q₀, s_pden = Σp₀q₁
    * 6dp-quantized) — shared text, one IEEE tree each; NULL when a
    * denominator degenerates. */
  private[operators] object PriceIndexFormula {
    private val las = "(CAST(s_lnum AS DOUBLE) / CAST(s_v0 AS DOUBLE))"
    private val paa = "(CAST(s_v1 AS DOUBLE) / CAST(s_pden AS DOUBLE))"
    val las4: String =
      s"CASE WHEN s_v0 > 0 THEN round($las, 4) END"
    val paa4: String =
      s"CASE WHEN s_pden > 0 THEN round($paa, 4) END"
    val fis4: String = s"CASE WHEN s_v0 > 0 AND s_pden > 0 THEN " +
      s"round(sqrt($las * $paa), 4) END"
  }

  private val SearchTerms = Seq("data", "stream", "merge")
  private val SearchProbe = 7L
  private val SearchDepth = 30
  private val SearchK = 10
  private val SearchRrfK = 60

  val oracle: Map[String, String] = Map(
    "q243_sql_template" -> SqlTemplate,

    // the same key-slice rosters, the same broadcast-shaped joins and
    // per-table one-row aggregates, exact-cent purge sums
    "q388_deletion_audit" ->
      """WITH roster AS (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |co AS (
        |  SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |  FROM orders o JOIN roster r ON o.o_custkey = r.c_custkey)
        |SELECT * FROM (
        |  SELECT 'customer' AS tbl,
        |         CAST(COUNT(*) AS BIGINT) AS n_del_keys,
        |         CAST(COUNT(*) AS BIGINT) AS n_rows,
        |         CAST(0 AS BIGINT) AS purge_cents
        |  FROM roster
        |  UNION ALL
        |  SELECT 'events',
        |         CAST(COUNT(DISTINCT user_id) AS BIGINT),
        |         CAST(COUNT(*) AS BIGINT),
        |         CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)),
        |                       0) AS BIGINT)
        |  FROM events WHERE user_id % 97 = 0
        |  UNION ALL
        |  SELECT 'lineitem',
        |         CAST(COUNT(DISTINCT co.o_custkey) AS BIGINT),
        |         CAST(COUNT(*) AS BIGINT),
        |         CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100)
        |                                AS BIGINT)), 0) AS BIGINT)
        |  FROM lineitem l JOIN co ON l.l_orderkey = co.o_orderkey
        |  UNION ALL
        |  SELECT 'orders',
        |         CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
        |         CAST(COUNT(*) AS BIGINT),
        |         CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100)
        |                                AS BIGINT)), 0) AS BIGINT)
        |  FROM co)
        |ORDER BY tbl ASC NULLS FIRST""".stripMargin,

    "q84_svc_revenue" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
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
        |ORDER BY region ASC NULLS FIRST, nation ASC NULLS FIRST""".stripMargin,

    "q86_svc_topcust" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend,
        |    COUNT(*) AS n_orders
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'
        |  GROUP BY o_custkey)
        |SELECT r."rank", r.custkey, c_name, r.spend, r.n_orders FROM (
        |  SELECT ROW_NUMBER() OVER (
        |      ORDER BY spend DESC NULLS LAST, o_custkey ASC) AS "rank",
        |    o_custkey AS custkey, spend, n_orders
        |  FROM spend QUALIFY "rank" <= 25) r
        |LEFT JOIN customer ON r.custkey = c_custkey
        |ORDER BY r."rank" ASC NULLS FIRST""".stripMargin,

    "q87_svc_activity" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
        |GROUP BY 1, 2
        |ORDER BY hour ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    "q88_svc_supplier" ->
      """SELECT n_name AS nation,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty,
        |  COUNT(DISTINCT l_suppkey) AS n_suppliers
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1
        |ORDER BY nation ASC NULLS FIRST""".stripMargin,

    "q89_svc_partshare" ->
      """WITH rev AS (
        |  SELECT p_type AS part_type,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev_dec,
        |    COUNT(*) AS n_lines
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1995-06-01'
        |    AND l_shipdate < TIMESTAMP '1996-06-01'
        |  GROUP BY 1)
        |SELECT part_type, CAST(rev_dec AS DOUBLE) AS revenue, n_lines,
        |  ROUND(CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER () AS DOUBLE), 4) AS share
        |FROM rev
        |ORDER BY part_type ASC NULLS FIRST""".stripMargin,

    // The q115 fusion replay re-parameterized: shared BM25 CTE with the
    // endpoint's term bag, cosine ranks around probe 7, depth 30, k 10.
    "q117_svc_search" -> {
      val cosSql = graft.functions.TextFunctions.Sql.cosine(
        "p.pe", "b.embedding")
      s"""WITH ${TfidfQueries.bm25RankCteSql(SearchTerms,
             excludeId = Some(SearchProbe))},
         |bm AS (SELECT id, rank AS r_bm FROM bmr WHERE rank <= $SearchDepth),
         |p AS (SELECT vec_id AS probe_id, embedding AS pe
         |      FROM embeddings WHERE vec_id = $SearchProbe),
         |cr AS (
         |  SELECT id, rn AS r_cos FROM (
         |    SELECT b.vec_id AS id,
         |           ROW_NUMBER() OVER (
         |             ORDER BY ROUND($cosSql, 4) DESC NULLS LAST,
         |                      b.vec_id ASC NULLS FIRST) AS rn
         |    FROM p CROSS JOIN embeddings b
         |    WHERE b.vec_id != p.probe_id) x
         |  WHERE rn <= $SearchDepth
         |), f AS (
         |  SELECT COALESCE(bm.id, cr.id) AS doc_id, bm.r_bm, cr.r_cos,
         |         ROUND(COALESCE(1.0 / ($SearchRrfK + CAST(bm.r_bm AS DOUBLE)), 0)
         |             + COALESCE(1.0 / ($SearchRrfK + CAST(cr.r_cos AS DOUBLE)), 0), 6)
         |           AS rrf6
         |  FROM bm FULL OUTER JOIN cr ON bm.id = cr.id)
         |SELECT doc_id, r_bm, r_cos, rrf6,
         |       CAST(ROW_NUMBER() OVER (ORDER BY rrf6 DESC NULLS LAST,
         |                               doc_id ASC NULLS FIRST) AS INT) AS rank
         |FROM f
         |QUALIFY rank <= $SearchK
         |ORDER BY rank ASC NULLS FIRST""".stripMargin
    },

    "q127_svc_marketshare" ->
      """WITH rev AS (
        |  SELECT r_name AS region, p_type AS part_type,
        |    CAST(year(o_orderdate) AS INT) AS yr,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev_dec
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2, 3)
        |SELECT region, part_type, yr, CAST(rev_dec AS DOUBLE) AS revenue,
        |  ROUND(CAST(rev_dec AS DOUBLE)
        |        / CAST(SUM(rev_dec) OVER (PARTITION BY region, yr) AS DOUBLE), 4)
        |    AS share
        |FROM rev
        |ORDER BY region ASC NULLS FIRST, yr ASC NULLS FIRST,
        |         part_type ASC NULLS FIRST""".stripMargin,

    "q128_svc_returns" ->
      """WITH lost AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS lost_revenue,
        |    COUNT(*) AS n_lines
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'
        |  GROUP BY o_custkey)
        |SELECT r."rank", r.custkey, c_name, n_name AS nation,
        |       r.lost_revenue, r.n_lines FROM (
        |  SELECT ROW_NUMBER() OVER (
        |      ORDER BY lost_revenue DESC NULLS LAST, o_custkey ASC) AS "rank",
        |    o_custkey AS custkey, lost_revenue, n_lines
        |  FROM lost QUALIFY "rank" <= 20) r
        |LEFT JOIN customer ON r.custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY r."rank" ASC NULLS FIRST""".stripMargin,

    "q136_cdc_merge" ->
      """WITH latest AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT user_id, event_type, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) x WHERE rn = 1
        |), ch AS (
        |  SELECT user_id AS c_custkey,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    'user_' || CAST(user_id AS VARCHAR) AS n_name,
        |    value AS n_bal
        |  FROM latest)
        |SELECT c_custkey,
        |  CASE WHEN op = 'U' THEN n_name ELSE c_name END AS c_name,
        |  CASE WHEN op = 'U' THEN n_bal ELSE c_acctbal END AS c_acctbal,
        |  CAST(CASE WHEN op = 'U' THEN 1 ELSE 0 END AS INTEGER) AS changed
        |FROM customer FULL OUTER JOIN ch USING (c_custkey)
        |WHERE op IS NULL OR op != 'D'
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    // each check as one aggregate, unioned — a zero-violation check
    // emits its row in both engines
    "q281_dq_checks" ->
      """WITH nullkeys AS (
        |  SELECT 'events_user_id_null' AS check_name,
        |         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_violations,
        |         COUNT(*) AS n_total
        |  FROM events),
        |orph AS (
        |  SELECT 'lineitem_orphan_orderkey',
        |         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0
        |              END) AS BIGINT),
        |         COUNT(*)
        |  FROM lineitem l LEFT JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey),
        |pkdup AS (
        |  SELECT 'lineitem_pk_duplicate',
        |         COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)),
        |         COUNT(*)
        |  FROM lineitem),
        |dom AS (
        |  SELECT 'part_retailprice_nonpositive',
        |         CAST(SUM(CASE WHEN p_retailprice <= 0 THEN 1 ELSE 0 END)
        |              AS BIGINT),
        |         COUNT(*)
        |  FROM part),
        |fut AS (
        |  SELECT 'orders_future_date',
        |         CAST(SUM(CASE WHEN o_orderdate > TIMESTAMP '2026-01-01'
        |              THEN 1 ELSE 0 END) AS BIGINT),
        |         COUNT(*)
        |  FROM orders),
        |u AS (SELECT * FROM nullkeys UNION ALL SELECT * FROM orph
        |      UNION ALL SELECT * FROM pkdup UNION ALL SELECT * FROM dom
        |      UNION ALL SELECT * FROM fut)
        |SELECT check_name, n_violations, n_total,
        |       ROUND(CAST(n_violations AS DOUBLE) / n_total, 4) AS rate4
        |FROM u ORDER BY check_name ASC NULLS FIRST""".stripMargin,

    // same versioning window as q135, then the as-of argmax per
    // (snapshot, user)
    "q274_pit_join" ->
      """WITH dim AS (
        |  SELECT user_id, ts AS valid_from, event_type, value,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY ts ASC, event_id ASC) AS INTEGER) AS version
        |  FROM events),
        |cal(snap_ts) AS (VALUES (TIMESTAMP '2024-01-08'),
        |  (TIMESTAMP '2024-01-15'), (TIMESTAMP '2024-01-22'),
        |  (TIMESTAMP '2024-01-29'))
        |SELECT c.snap_ts, d.user_id, d.version, d.event_type, d.value
        |FROM dim d CROSS JOIN cal c
        |WHERE d.valid_from <= c.snap_ts
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY c.snap_ts, d.user_id
        |  ORDER BY d.version DESC) = 1
        |ORDER BY snap_ts ASC NULLS FIRST, user_id ASC NULLS FIRST"""
        .stripMargin,

    "q135_scd2_history" ->
      """SELECT user_id, version, valid_from, valid_to, is_current,
        |       event_type, value FROM (
        |  SELECT user_id,
        |    CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
        |    ts AS valid_from,
        |    LEAD(ts, 1) OVER w AS valid_to,
        |    CAST(CASE WHEN LEAD(ts, 1) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS INTEGER) AS is_current,
        |    event_type, value
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY ts ASC, event_id ASC)) x
        |ORDER BY user_id ASC NULLS FIRST, version ASC NULLS FIRST""".stripMargin,

    "q126_integrity_audit" ->
      """SELECT check_name, n_bad FROM (
        |  SELECT 'customers_without_orders' AS check_name, COUNT(*) AS n_bad
        |  FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  UNION ALL
        |  SELECT 'lineitems_without_order', COUNT(*)
        |  FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'orders_without_customer', COUNT(*)
        |  FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'orders_without_lineitems', COUNT(*)
        |  FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |  UNION ALL
        |  SELECT 'parts_never_shipped', COUNT(*)
        |  FROM part p WHERE NOT EXISTS
        |    (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        |  UNION ALL
        |  SELECT 'suppliers_never_shipped', COUNT(*)
        |  FROM supplier s WHERE NOT EXISTS
        |    (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
        |) ORDER BY check_name ASC NULLS FIRST""".stripMargin,

    "q180_ship_sla" ->
      """WITH lat AS (
        |  SELECT o.o_orderpriority AS pri,
        |         date_diff('day', CAST(o.o_orderdate AS DATE),
        |                   CAST(l.l_shipdate AS DATE)) AS days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |h AS (SELECT pri, days, COUNT(*) AS cnt FROM lat GROUP BY 1, 2),
        |n AS (SELECT pri, SUM(cnt) AS n FROM h GROUP BY 1),
        |cum AS (
        |  SELECT pri, days, cnt,
        |         SUM(cnt) OVER (PARTITION BY pri ORDER BY days) AS cc
        |  FROM h)
        |SELECT cum.pri, CAST(MAX(n.n) AS BIGINT) AS n_lines,
        |  CAST(MIN(CASE WHEN cc >= (n.n + 1) // 2 THEN days END)
        |    AS INT) AS p50_days,
        |  CAST(MIN(CASE WHEN cc >= (9 * n.n + 9) // 10 THEN days END)
        |    AS INT) AS p90_days,
        |  CAST(MIN(CASE WHEN cc >= (99 * n.n + 99) // 100 THEN days END)
        |    AS INT) AS p99_days
        |FROM cum JOIN n ON n.pri = cum.pri
        |GROUP BY 1 ORDER BY cum.pri ASC NULLS FIRST""".stripMargin,

    "q213_local_supplier_rev" ->
      """SELECT n_name AS nation,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |             AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
        |GROUP BY n_name
        |ORDER BY revenue DESC NULLS LAST, nation ASC NULLS FIRST""".stripMargin,

    // the index replay: same per-(part, year) collapse, exact direct
    // sums, 6dp-quantized cross-weighted terms, SAME index trees
    "q345_price_index" ->
      s"""WITH py AS (
         |  SELECT l_partkey, year(l_shipdate) AS yr,
         |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         |         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
         |           AS BIGINT) AS v
         |  FROM lineitem
         |  WHERE year(l_shipdate) IN ($PiBaseYear, $PiCurYear)
         |  GROUP BY 1, 2),
         |b AS (SELECT l_partkey, q AS q0, v AS v0 FROM py
         |      WHERE yr = $PiBaseYear),
         |c AS (SELECT l_partkey, q AS q1, v AS v1 FROM py
         |      WHERE yr = $PiCurYear),
         |m AS (
         |  SELECT COUNT(*) AS n_parts,
         |         CAST(SUM(v0) AS BIGINT) AS s_v0,
         |         CAST(SUM(v1) AS BIGINT) AS s_v1,
         |         SUM(CAST(round(CAST(v1 AS DOUBLE) * CAST(q0 AS DOUBLE)
         |           / CAST(q1 AS DOUBLE), 6) AS DECIMAL(38,6))) AS s_lnum,
         |         SUM(CAST(round(CAST(v0 AS DOUBLE) * CAST(q1 AS DOUBLE)
         |           / CAST(q0 AS DOUBLE), 6) AS DECIMAL(38,6))) AS s_pden
         |  FROM b JOIN c USING (l_partkey))
         |SELECT CAST(n_parts AS BIGINT) AS n_parts,
         |       ${PriceIndexFormula.las4} AS laspeyres4,
         |       ${PriceIndexFormula.paa4} AS paasche4,
         |       ${PriceIndexFormula.fis4} AS fisher4
         |FROM m""".stripMargin,

    // the same matched panel + one-row totals, the SAME half-share
    // log-relative trees 8dp-quantized + decimal-summed
    "q364_tornqvist" ->
      s"""WITH py AS (
         |  SELECT l_partkey, year(l_shipdate) AS yr,
         |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         |         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
         |           AS BIGINT) AS v
         |  FROM lineitem
         |  WHERE year(l_shipdate) IN ($PiBaseYear, $PiCurYear)
         |  GROUP BY 1, 2),
         |b AS (SELECT l_partkey, q AS q0, v AS v0 FROM py
         |      WHERE yr = $PiBaseYear),
         |c AS (SELECT l_partkey, q AS q1, v AS v1 FROM py
         |      WHERE yr = $PiCurYear),
         |mm AS (SELECT * FROM b JOIN c USING (l_partkey)),
         |tot AS (
         |  SELECT CAST(SUM(v0) AS BIGINT) AS tv0,
         |         CAST(SUM(v1) AS BIGINT) AS tv1
         |  FROM mm),
         |ag AS (
         |  SELECT COUNT(*) AS n_parts,
         |         SUM(CAST(round(
         |           (CAST(v0 AS DOUBLE) / CAST(tv0 AS DOUBLE)
         |            + CAST(v1 AS DOUBLE) / CAST(tv1 AS DOUBLE))
         |           * LN(CAST(v1 AS DOUBLE) * CAST(q0 AS DOUBLE)
         |             / (CAST(v0 AS DOUBLE) * CAST(q1 AS DOUBLE)))
         |           / 2.0, 8) AS DECIMAL(38,8))) AS s_t
         |  FROM mm CROSS JOIN tot)
         |SELECT CAST(n_parts AS BIGINT) AS n_parts,
         |       ROUND(CAST(s_t AS DOUBLE), 6) AS ln_t6,
         |       ROUND(EXP(CAST(s_t AS DOUBLE)), 4) AS tornqvist4
         |FROM ag""".stripMargin,

    // the same count-of-counts histogram, window cumulative, rank
    // picks, [D5] mean staging, and skew ratio
    "q376_join_skew_audit" ->
      """WITH pk AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |h AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM pk GROUP BY 1),
        |cum AS (
        |  SELECT c, cnt,
        |         CAST(SUM(cnt) OVER (ORDER BY c ASC) AS BIGINT) AS cum,
        |         CAST(SUM(cnt) OVER () AS BIGINT) AS n
        |  FROM h),
        |a AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS n_keys,
        |         CAST(SUM(c * cnt) AS BIGINT) AS n_rows,
        |         MIN(CASE WHEN cum * 2 >= n THEN c END) AS p50_rows,
        |         MIN(CASE WHEN cum * 100 >= n * 99 THEN c END)
        |           AS p99_rows,
        |         MAX(c) AS max_rows
        |  FROM cum)
        |SELECT n_keys, n_rows,
        |       CAST((2 * n_rows * 10000 + n_keys) // (2 * n_keys)
        |         AS DOUBLE) / 10000.0 AS mean_rows4,
        |       p50_rows, p99_rows, max_rows,
        |       ROUND(CAST(max_rows AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |         / CAST(n_rows AS DOUBLE), 4) AS skew4
        |FROM a""".stripMargin,

    // the maintenance identity: the oracle recomputes the rollup in
    // ONE direct pass with parity-split conditional sums — hash
    // equality against the Spark merge-of-partials plan IS the
    // base+delta ≡ full-recompute proof
    "q369_agg_maintenance" ->
      s"""WITH o AS (
         |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
         |           AS month,
         |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         |         (${GraphQueries.polyMixSql(
              GraphQueries.pmodSql("o_orderkey"))}) % 2 AS flag
         |  FROM orders)
         |SELECT month,
         |       CAST(SUM(CASE WHEN flag = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_base,
         |       CAST(SUM(CASE WHEN flag = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_delta,
         |       CAST(COUNT(*) AS BIGINT) AS n_orders,
         |       CAST(SUM(cents) AS BIGINT) AS revenue_cents
         |FROM o GROUP BY 1
         |ORDER BY month ASC NULLS FIRST""".stripMargin,

    // the inventory replay: same daily histogram, HUGEINT moments,
    // SAME StockFormula trees, [D5] integer-staged mean
    "q354_safety_stock" ->
      s"""WITH daily AS (
         |  SELECT p_type, date_trunc('day', l_shipdate) AS day,
         |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  GROUP BY 1, 2),
         |per AS (
         |  SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         |         CAST(SUM(q) AS BIGINT) AS s1,
         |         SUM(CAST(q AS HUGEINT) * q) AS s2
         |  FROM daily GROUP BY 1)
         |SELECT p_type, n_days, s1 AS total_qty,
         |       CAST((2 * s1 * 10000 + n_days) // (2 * n_days) AS DOUBLE)
         |         / 10000.0 AS mean4,
         |       ${StockFormula.sd4} AS sd4,
         |       ${StockFormula.safety4} AS safety4,
         |       ${StockFormula.rop4} AS rop4
         |FROM per
         |ORDER BY p_type ASC NULLS FIRST""".stripMargin
  )
}
