package graft.operators

import graft.{Dets, Tables}
import graft.functions.GlobalRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the daily order/event series — smoothing,
  * volatility banding, calendar gap repair and per-group trend fitting
  * (the reporting shapes the reference's scheduled aggregation endpoints
  * serve off the order-date axis).
  *
  * Scale notes — none of these queries uses a range join or a global
  * single-partition window:
  *  - q158/q159's fixed-width trailing windows are EXPLODE→EQUI-JOIN:
  *    each day's value is replicated to the ≤8 calendar days it
  *    contributes to (a constant fan-out), then one hash aggregation on
  *    the target day collects the window — shuffle keys stay equi, and
  *    the whole pipeline is two map-side-combinable aggs over a
  *    value-domain-bounded day table.
  *  - q158's smoothing kernel is DYADIC (α = 1/2, 8-tap truncation):
  *    every weight is a power of two, so the weighted sum is an exact
  *    BIGINT and the emitted ewma = num/256.0 is an exact dyadic double
  *    on both engines — no pow(), no float accumulation order anywhere.
  *  - q159's window moments are exact integer/decimal sums; the one
  *    double formula at the end is the q43/q152 fixed formulation.
  *  - q160's forward fill is two [[GlobalRank.cumSum]] passes + an
  *    equi-join (cum of a presence indicator indexes the latest
  *    non-gap day at or before each spine day; the daily table ranked
  *    by the same cumSum supplies the fill value) — the distributed
  *    form of LAST_VALUE(... IGNORE NULLS), which the oracle uses as
  *    the algorithm-independent spec.
  *  - q163 reduces the fact scan to (group, year) partial aggregates
  *    before fitting; the OLS slope/intercept come from exact decimal
  *    moment sums and one fixed double formula per group.
  */
object TimeSeriesQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val DayUs = 86400000000L

  /** q263 rolling-regression window (days). */
  private val RollWin = 28

  /** q310's RSI lookback (trailing deltas per frame). */
  private val RsiWin = 14L

  /** q295's 12×12 DTW band as nested higher-order folds over the
    * integer permille profiles `pa`/`pb` — the classic row-carried DP:
    * the outer fold's accumulator is the previous DP row, the inner
    * fold appends cur[j] = |pa_i − pb_j| + min(prev[j], prev[j−1],
    * cur[j−1]) (the cur[j−1] carry is why a plain zip_with cannot
    * express a row). Both engines run the identical recurrence on
    * identical integers; the surface syntax differs (Spark `aggregate`
    * takes an init value, DuckDB `list_reduce` folds from the first
    * element, so the oracle seeds the fold list with the init row),
    * which is why this is two mirrored texts rather than one shared
    * string — every intermediate is an exact BIGINT, so there is no
    * IEEE tree to keep identical. */
  private[operators] object DtwExpr {
    val spark: String =
      """aggregate(
        |  sequence(2, 12),
        |  aggregate(sequence(2, 12),
        |    array(abs(element_at(pa, 1) - element_at(pb, 1))),
        |    (acc, j) -> array_append(acc, element_at(acc, -1)
        |      + abs(element_at(pa, 1) - element_at(pb, j)))),
        |  (prev, i) -> aggregate(sequence(2, 12),
        |    array(element_at(prev, 1)
        |      + abs(element_at(pa, i) - element_at(pb, 1))),
        |    (cur, j) -> array_append(cur,
        |      abs(element_at(pa, i) - element_at(pb, j))
        |      + least(element_at(prev, j), element_at(prev, j - 1),
        |              element_at(cur, -1)))),
        |  row -> element_at(row, 12))""".stripMargin
    val duck: String =
      """list_reduce(
        |  list_concat(
        |    [list_reduce(
        |       list_concat([[abs(pa[1] - pb[1])]],
        |                   list_transform(range(2, 13), j -> [j])),
        |       (acc, e) -> list_append(acc,
        |         acc[-1] + abs(pa[1] - pb[e[1]])))],
        |    list_transform(range(2, 13), i -> [i])),
        |  (prev, ie) -> list_reduce(
        |     list_concat([[prev[1] + abs(pa[ie[1]] - pb[1])]],
        |                 list_transform(range(2, 13), j -> [j])),
        |     (cur, je) -> list_append(cur,
        |        abs(pa[ie[1]] - pb[je[1]])
        |        + least(prev[je[1]], prev[je[1] - 1], cur[-1]))))[12]"""
        .stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MASE of the seasonal-naive forecast on daily revenue (Hyndman &
    // Koehler 2006, the public scale-free forecast-accuracy metric) —
    // the missing EVALUATION row next to q257's backtest: score the
    // week-ago forecast d̂_t = d_{t−7} against the one-day naive
    // scaling MAE(|d_t − d_{t−1}|); MASE < 1 ⇔ weekly seasonality
    // beats persistence. Both error sets are shifted equi-joins of
    // the calendar-bounded daily cents table (the q152 class — no
    // window); absolute errors are exact integer cents, means are
    // truncating div [D5], ONE final double ratio. Gaps in the
    // calendar break pairs identically on both engines.
    "q395_mase" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(unix_micros(date_trunc("day", col("o_orderdate")))
          .as("day_us"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("c"))
      def shifted(lagDays: Long, err: String, n: String) =
        daily.select(col("day_us"), col("c").as("ct"))
          .join(daily.select(
            (col("day_us") + lit(lagDays * 86400000000L)).as("day_us"),
            col("c").as("cp")), Seq("day_us"))
          .agg(count(lit(1)).as(n),
            sum(abs(col("ct") - col("cp"))).as(err))
      shifted(1L, "se1", "n1").crossJoin(
          broadcast(shifted(7L, "se7", "n7")))
        .select(col("n1").as("n_naive"), col("n7").as("n_seasonal"),
          expr("se1 div n1").as("mae_naive_cents"),
          expr("se7 div n7").as("mae_seasonal_cents"),
          round((col("se7").cast("double") / col("n7"))
            / (col("se1").cast("double") / col("n1")), 4).as("mase4"))
    }),

    // Volume drawdown — the deepest and longest excursion of daily
    // revenue below its running peak: the series-health readout a
    // capacity planner reads next to q154's z-scores (z flags single
    // anomalous days; drawdown measures sustained decline from the
    // high-water mark). The corpus collapses to the calendar-bounded
    // daily table first; the running peak and row spine are global
    // ordered windows over that bounded relation (allowlisted q160/
    // q203 class); the longest underwater streak is gaps-and-islands
    // (rn − rn_underwater) + one keyed count. All integer cents; the
    // one double is the rounded dd/peak ratio of exact ints.
    "q301_drawdown" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val w = Window.orderBy(col("day").asc)
      val d = daily
        .withColumn("peak", max(col("cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("dd", col("peak") - col("cents"))
        .withColumn("rn", row_number().over(w))
      val heads = d.agg(count(lit(1)).as("n_days"),
        max(col("dd")).as("max_dd_cents"),
        max(round(col("dd").cast("double")
          / col("peak").cast("double"), 6)).as("maxdd_pct6"))
      val streak = d.filter(col("dd") > 0)
        .withColumn("rnu", row_number().over(w))
        .groupBy((col("rn") - col("rnu")).as("grp"))
        .agg(count(lit(1)).as("len"))
        .agg(max(col("len")).as("longest"))
      heads.crossJoin(broadcast(streak))
        .select(col("n_days"), col("max_dd_cents"), col("maxdd_pct6"),
          coalesce(col("longest"), lit(0L)).as("longest_under_days"))
    }),

    // RSI-14 (Cutler's simple-average form) — the momentum oscillator
    // over the daily revenue series: 100·ΣG/(ΣG+ΣL) over the trailing
    // 14 rank-adjacent deltas (gains G = max(Δ,0), losses L =
    // max(−Δ,0)). Wilder's recursive smoothing would demand a float
    // recurrence; Cutler's windowed-sum variant is the standard
    // alternative and is EXACT integer cents end to end — the one
    // double is the final rounded ratio. Deltas come from ONE rank-
    // spine equi-join (rn = rn′+1, the q152 shape); the trailing
    // window is the q158 explode→equi-join fan-out (constant 14×, no
    // window function); partial head frames are excluded by the exact
    // frame-count filter identically on both engines.
    "q310_rsi" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val (pool, _) = GlobalRank.rowNumberWithTotal(
        daily, Seq(col("day").asc))
      val ranked = pool.select(col("rn"), col("day"), col("cents"))
      val dlt = ranked.alias("a")
        .join(ranked.select((col("rn") + 1).as("rn"),
          col("cents").as("prev")), Seq("rn"))
        .select(col("rn"),
          greatest(col("cents") - col("prev"), lit(0L)).as("g"),
          greatest(col("prev") - col("cents"), lit(0L)).as("l"))
      val win = dlt.select(
          explode(sequence(col("rn"), col("rn") + lit(RsiWin - 1L)))
            .as("rn"), col("g"), col("l"))
        .groupBy("rn").agg(count(lit(1)).as("nf"),
          sum(col("g")).as("sg"), sum(col("l")).as("sl"))
        .filter(col("nf") === RsiWin)
      win.join(ranked, Seq("rn"))
        .select(col("day"), col("sg").as("gain_cents"),
          col("sl").as("loss_cents"),
          when(col("sg") + col("sl") > 0,
            round(lit(100d) * col("sg").cast("double")
              / (col("sg") + col("sl")).cast("double"), 6)).as("rsi6"))
        .orderBy("day")
    }),

    // Theil–Sen estimator — the MEDIAN of all pairwise slopes of the
    // 1995 daily-revenue series: the robust trend line q163's OLS
    // cousin, immune to the outlier days that drag a least-squares
    // fit. The corpus collapses to the ≤365-row daily table first
    // (calendar-bounded), so the pair pass is a bounded half-grid
    // broadcast (documented BNLJ) — slope count is (days choose 2),
    // a property of the CALENDAR, not the corpus. Each slope is one
    // IEEE division of exact int64 cents/day deltas (bit-identical
    // across engines); the median picks by RANK from the slope value
    // histogram via the distributed cumSum (q44/q169 machinery, no
    // global sort), averaging the two middle values on even counts.
    "q289_theil_sen" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1995)
        .groupBy(datediff(to_date(col("o_orderdate")),
          to_date(lit("1995-01-01"))).as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val a = daily.select(col("d").as("da"), col("cents").as("ca"))
      val b = daily.select(col("d").as("db"), col("cents").as("cb"))
      val slopes = a.join(broadcast(b), col("db") > col("da"))
        .select(((col("cb") - col("ca")).cast("double")
          / (col("db") - col("da")).cast("double")).as("slope"))
      val hist = slopes.groupBy("slope").agg(count(lit(1)).as("cnt"))
        .withColumn("g", lit(1))
      val nd = daily.agg(count(lit(1)).as("n_days"))
      GlobalRank.cumSum(hist, "g", "slope", "cnt")
        .agg(max(col("n")).as("n_pairs"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("slope")))
            .as("lo"),
          min(when(col("cum") >= expr("n div 2 + 1"), col("slope")))
            .as("hi"))
        .crossJoin(broadcast(nd))
        .select(col("n_days"), col("n_pairs"),
          round((col("lo") + col("hi")) / 2, 6).as("sen_slope6"))
    }),

    // Dynamic time warping — the alignment-tolerant series distance
    // between every pair of YEARS' monthly revenue profiles (12-point
    // integer permille shapes, level-free by construction), next to
    // the rigid L1 for contrast: DTW forgives a season arriving a
    // month late where L1 charges it twice. The corpus collapses to
    // the 7×12 (year, month) grid FIRST, so the full 12×12 DP runs
    // once per year pair (21 pairs — a bounded broadcast self-join,
    // documented BNLJ), entirely INSIDE a codegen'd higher-order
    // expression: the outer fold carries the DP row across profile
    // rows, the inner fold resolves the cur[j−1] dependency within a
    // row — no UDF, no driver loop, and exact |Δpermille| integer
    // costs end to end, replayed bit-for-bit by the oracle's nested
    // list_reduce. At 100 TB (many series × bounded length) the same
    // expression runs per pair row after the blocking join — the DP
    // never leaves the executors.
    "q295_dtw" -> ((s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      val prof = monthly.groupBy("yr")
        .agg(expr("transform(array_sort(collect_list(struct(mon, c)))," +
          " x -> x.c)").as("cs"),
          sum(col("c")).as("tot"), count(lit(1)).as("nm"))
        .filter(col("nm") === 12)
        .select(col("yr"),
          expr("transform(cs, c -> c * 1000L div tot)").as("p"))
      val a = prof.select(col("yr").as("yr_a"), col("p").as("pa"))
      val b = prof.select(col("yr").as("yr_b"), col("p").as("pb"))
      a.join(broadcast(b), col("yr_a") < col("yr_b"))
        .select(col("yr_a"), col("yr_b"),
          expr("aggregate(zip_with(pa, pb, (x, y) -> abs(x - y)), 0L," +
            " (acc, v) -> acc + v)").as("l1"),
          expr(DtwExpr.spark).as("dtw"))
        .orderBy("yr_a", "yr_b")
    }),

    // Hampel filter — the rolling-median outlier screen on the daily
    // revenue series (q154's global z-score cousin, robust to the
    // outliers it hunts): per day, the 7-day centered window median
    // and the window MAD, flagging |x − med| > 3·MAD. EVERYTHING is
    // exact integer cents: the odd window makes both medians single
    // picked elements (sorted[4] of 7) with no interpolation, and the
    // fence compare is pure integer arithmetic — no 1.4826 sigma
    // scaling to drift. Head/tail days with partial windows are
    // excluded by the frame-size filter, identically on both engines.
    // The series is calendar-bounded, so the one global ordered window
    // is a documented bounded site (allowlisted, q160/q203 class).
    "q294_hampel" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(expr("cast(datediff(o_orderdate, date'1992-01-01') " +
          "as bigint)").as("d"))
        .agg(expr("sum(cast(round(o_totalprice * 100) as bigint))")
          .as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("d").asc).rowsBetween(-3, 3)
      daily.withColumn("win", collect_list(col("cents")).over(w))
        .filter(size(col("win")) === 7)
        .withColumn("med", element_at(array_sort(col("win")), 4))
        .withColumn("mad", element_at(array_sort(
          expr("transform(win, x -> abs(x - med))")), 4))
        .select(col("d"), col("cents"), col("med"), col("mad"),
          (abs(col("cents") - col("med")) > lit(3) * col("mad"))
            .cast("int").as("is_out"))
        .orderBy("d")
    }),

    // Exponentially-weighted moving average of the daily event count,
    // α = 1/2 truncated at 8 taps: ewma_t = Σ_{k=0..7} 2^{7-k}·c_{t-k}
    // / 256. The weighted numerator is an exact BIGINT (so the division
    // by 256.0 is an exact dyadic double bit-identical across engines
    // and fold orders); days absent from the series contribute nothing
    // on both sides by construction.
    "q158_ewma" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(unix_micros(date_trunc("day", col("ts"))).as("day_us"))
        .agg(count(lit(1)).as("c"))
      // each source day feeds itself + the next 7 days at halving weight
      val contrib = daily
        .select(col("day_us"), col("c"),
          explode(sequence(lit(0), lit(7))).as("k"))
        .select((col("day_us") + col("k") * DayUs).as("day_us"),
          (col("c") * expr("shiftleft(cast(1 as bigint), 7 - k)")).as("w"))
      val num = contrib.groupBy("day_us").agg(sum(col("w")).as("num"))
      // inner join back to the series: only real days are emitted
      daily.join(num, Seq("day_us"))
        .select(tsOut(timestamp_micros(col("day_us"))).as("day"),
          col("c").as("n_events"), col("num"),
          (col("num").cast("double") / lit(256.0)).as("ewma"))
        .orderBy("day")
    }),

    // Bollinger screen on daily order revenue: each day vs the mean ±
    // 2σ of the 7 PRECEDING calendar days (population σ from exact
    // integer-cent sums). Only full windows are scored; breach is
    // emitted as a flag, not a filter, so the output is the whole
    // scored series.
    "q159_bollinger" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(unix_micros(date_trunc("day", col("o_orderdate")))
          .as("day_us"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val d19 = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
      // day d contributes to targets d+1 .. d+7 (strictly-preceding window)
      val contrib = daily
        .select(col("day_us"), col("cents"),
          explode(sequence(lit(1), lit(7))).as("k"))
        .select((col("day_us") + col("k") * DayUs).as("day_us"),
          col("cents").as("bc"))
      val win = contrib.groupBy("day_us")
        .agg(count(lit(1)).as("n_win"), sum(col("bc")).as("sx"),
          sum(d19(col("bc")) * d19(col("bc"))).as("sxx"))
      daily.join(win, Seq("day_us")).filter(col("n_win") === 7)
        .withColumn("mean", col("sx").cast("double") / col("n_win"))
        .withColumn("sd", sqrt(greatest(lit(0d),
          col("sxx").cast("double") / col("n_win")
            - col("mean") * col("mean"))))
        .select(tsOut(timestamp_micros(col("day_us"))).as("day"),
          col("cents"),
          round(safeDiv(col("cents") - col("mean"), col("sd")), 4).as("z4"),
          (abs(col("cents") - col("mean")) > lit(2d) * col("sd"))
            .cast("int").as("breach"))
        .orderBy("day")
    }),

    // Calendar gap repair: the full day spine from the first to the
    // last order day, with missing days forward-filled from the latest
    // preceding real day. cumSum of the presence indicator gives every
    // spine day the 1-based index of its fill source; the daily table
    // ranked by the same cumSum is equi-joined on that index — fully
    // distributed, no IGNORE NULLS window.
    "q160_gap_fill" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(unix_micros(date_trunc("day", col("o_orderdate")))
          .as("day_us"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val spine = daily
        .agg(min(col("day_us")).as("lo"), max(col("day_us")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), lit(DayUs)))
          .as("day_us"))
      val j = spine.join(daily, Seq("day_us"), "left")
        .withColumn("present", when(col("cents").isNotNull, 1).otherwise(0))
        .withColumn("g", lit(1))
      val idx = GlobalRank.cumSum(j, "g", "day_us", "present")
        .select(col("day_us"), col("present"), col("cum").as("fill_idx"))
      val ranked = GlobalRank.cumSum(
          daily.withColumn("one", lit(1)).withColumn("g", lit(1)),
          "g", "day_us", "one")
        .select(col("cum").as("fill_idx"), col("cents").as("cents_filled"))
      // the spine starts at the first REAL day, so fill_idx >= 1 always
      idx.join(ranked, Seq("fill_idx"))
        .select(tsOut(timestamp_micros(col("day_us"))).as("day"),
          col("cents_filled"), (lit(1) - col("present")).as("was_gap"))
        .orderBy("day")
    }),

    // Per-nation OLS trend of yearly order revenue: slope and intercept
    // from exact decimal moment sums (x = calendar year, y = revenue
    // cents), one fixed double formula per group — the q152 moment
    // discipline applied to regression.
    "q163_trend" -> ((s, dir) => {
      val d19 = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
      val yr = t(s, dir, "orders")
        .join(t(s, dir, "customer").select(col("c_custkey"),
          col("c_nationkey")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation").select(col("n_nationkey"),
          col("n_name"))), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          year(col("o_orderdate")).cast("long").as("y"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      val st = yr.groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("v")).as("sv"),
          sum(d19(col("y")) * d19(col("y"))).as("syy"),
          sum(d19(col("y")) * d19(col("v"))).as("syv"))
      val den = (col("syy").cast("double") * col("n")
        - col("sy").cast("double") * col("sy").cast("double"))
      // slope/intercept magnitudes are ~1e8–1e11 cents: at that size a
      // 4dp ROUND sits below the double's ulp and the engines' rounding
      // paths disagree in the last digit — emit whole cents as BIGINT
      // (round-to-integer of identical doubles is engine-stable)
      st.select(col("n_name"), col("n").as("n_years"),
          round(safeDiv(
            col("syv").cast("double") * col("n")
              - col("sy").cast("double") * col("sv").cast("double"), den))
            .cast("long").as("slope_cents"),
          round(safeDiv(
            col("sv").cast("double") * col("syy").cast("double")
              - col("sy").cast("double") * col("syv").cast("double"), den))
            .cast("long").as("intercept_cents"))
        .orderBy("n_name")
    }),

    // CUSUM mean-shift screen over the daily event-count series — the
    // classic changepoint detector: S_d = Σ_{≤d}(c − μ) drifts fastest
    // where the level shifts, so argmax |S| marks the candidate break.
    // S_d decomposes as cumc_d − idx_d·μ: both running terms come from
    // [[GlobalRank.cumSum]] passes over the ~365-row day table (counts,
    // then a presence indicator for the day index — the q144 two-pass
    // shape), μ attaches as a broadcast one-row exact total, and the
    // peak marker re-attaches the same way. No global window anywhere.
    "q203_cusum_shift" -> ((s, dir) => {
      val days = t(s, dir, "events")
        .groupBy(unix_micros(date_trunc("day", col("ts"))).as("day_us"))
        .agg(count(lit(1)).as("c"))
        .withColumn("g", lit(1)).withColumn("one", lit(1L))
      val cumc = GlobalRank.cumSum(days, "g", "day_us", "c")
        .withColumnRenamed("cum", "cumc").drop("n")
      val idx = GlobalRank.cumSum(cumc, "g", "day_us", "one")
        .withColumnRenamed("cum", "idx").drop("n")
      val tot = days.agg(sum(col("c")).as("tot"),
        count(lit(1)).as("nd"))
      val ser = idx.crossJoin(broadcast(tot))
        .withColumn("s4", round(col("cumc").cast("double")
          - col("idx") * (col("tot").cast("double") / col("nd")), 4))
      ser.crossJoin(broadcast(ser.agg(max(abs(col("s4"))).as("peak"))))
        .select(tsOut(timestamp_micros(col("day_us"))).as("day"),
          col("c").as("n_events"), col("s4"),
          (abs(col("s4")) === col("peak")).as("is_peak"))
        .orderBy("day")
    }),

    // Year-over-year revenue growth per nation — the periodic
    // comparative the reporting endpoints serve. The fact scan reduces
    // to (nation, year) exact decimal partials FIRST; the previous
    // year attaches by a keyed equi-join on (nation, year+1) over that
    // ~175-row table (no window, no second fact pass), NULL growth on
    // each nation's first year.
    "q210_yoy_growth" -> ((s, dir) => {
      val yr = t(s, dir, "orders")
        .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
        .agg(decSum(col("o_totalprice")).as("rev"))
      val prev = yr.select(col("n_name"), (col("yr") + 1).as("yr"),
        col("rev").as("prev_rev"))
      yr.join(prev, Seq("n_name", "yr"), "left")
        .select(col("n_name"), col("yr"),
          col("rev").cast("double").as("rev"),
          round((col("rev") - col("prev_rev")).cast("double")
            / col("prev_rev").cast("double") * 100, 4).as("yoy_pct"))
        .orderBy("n_name", "yr")
    }),

    // PAA + SAX symbolization (round 10) — the time-series
    // dimensionality reduction that makes similarity search over long
    // series tractable at 100 TB (compare 8 letters per year, not 365
    // raw points): each year's daily revenue series splits into 8
    // calendar segments ((doy−1)·8 div 366 — leap-safe integer
    // arithmetic, no per-row windows), the PAA mean per segment lives
    // in EXACT integer micro-units ([D5]: cents·10⁴ div n_days —
    // truncating, engine-identical), the per-year z-normalization
    // derives from the exact integer moment pair (Σu, Σu² in
    // DECIMAL(38,0)/HUGEINT, the q251 staging), and the SAX letter is
    // the N(0,1) quartile breakpoint CASE (±0.6745, 0 — the standard
    // alphabet-4 table). One keyed agg per stage, nothing scans the
    // raw series twice; a constant year (std = 0) letters 'c' rather
    // than dividing by zero.
    "q256_sax_paa" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val daily = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          dayofyear(col("o_orderdate")).as("doy"))
        .agg(expr("sum(cast(round(o_totalprice * 100) as bigint))")
          .as("cents"))
      val segs = daily
        .groupBy(col("yr"), expr("((doy - 1) * 8) div 366").as("seg"))
        .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("segc"))
        .withColumn("u", expr("(segc * 10000L) div n_days"))
      val ystat = segs.groupBy("yr")
        .agg(count(lit(1)).as("nseg"), sum(d38(col("u"))).as("sm"),
          sum(d38(col("u")) * col("u")).as("sm2"))
        .select(col("yr"), col("nseg"),
          (col("sm").cast("double") / col("nseg")).as("mean"),
          (sqrt((d38(col("nseg")) * col("sm2") - col("sm") * col("sm"))
            .cast("double")) / col("nseg")).as("std"))
      segs.join(ystat, Seq("yr"))
        .select(col("yr"), col("seg"), col("n_days"),
          round(col("u") / 1e6, 4).as("segmean4"),
          round(when(col("std") > 0,
            (col("u").cast("double") - col("mean")) / col("std"))
            .otherwise(0d), 4).as("z4"))
        .withColumn("sax",
          when(col("z4") < -0.6745, "a").when(col("z4") < 0d, "b")
            .when(col("z4") < 0.6745, "c").otherwise("d"))
        .orderBy("yr", "seg")
    }),

    // Seasonal-naive forecast BACKTEST (round 10) — the eval that
    // belongs beside q163's trend fit and q256's symbolization: the
    // standard baseline forecast pred(y, m) = actual(y−1, m) scaled by
    // last year's growth ratio tot(y−1)/tot(y−2), backtested against
    // every year with two priors, scored as MAPE. INTEGER-EXACT end to
    // end ([D5]): monthly revenue in cents, the growth scaling and the
    // per-month absolute-percentage-error permille are truncating
    // integer ratios, the per-year MAPE is the truncating mean of the
    // month permilles — so the whole backtest replays bit-for-bit.
    // Any real forecast deployment reads exactly this table before
    // trusting a model; the baseline it scores here is the one a
    // learned model must beat. Two keyed aggs + two self-joins on
    // (yr, mo) — no windows, the fact table is scanned once.
    "q257_forecast_backtest" -> ((s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(expr("sum(cast(round(o_totalprice * 100) as bigint))")
          .as("cents"))
        .localCheckpoint(true)
      val tot = monthly.groupBy("yr").agg(sum(col("cents")).as("tot"))
      val growth = tot.select((col("yr") + 1).as("yr"), col("tot").as("t1"))
        .join(tot.select((col("yr") + 2).as("yr"), col("tot").as("t2")),
          Seq("yr"))
        .filter(col("t2") > 0)
      val pred = monthly
        .select((col("yr") + 1).as("yr"), col("mo"),
          col("cents").as("prev_cents"))
        .join(growth, Seq("yr"))
        // cents × yearly-total overflows int64 — stage the product in
        // DECIMAL(38,0) (HUGEINT on the oracle side), emit BIGINT
        .select(col("yr"), col("mo"),
          expr("cast((cast(prev_cents as decimal(38,0)) * t1) div t2" +
            " as bigint)").as("pred_cents"))
      monthly.join(pred, Seq("yr", "mo"))
        .filter(col("cents") > 0)
        .withColumn("ape_pm",
          expr("(1000L * abs(pred_cents - cents)) div cents"))
        .groupBy("yr")
        .agg(count(lit(1)).as("n_months"),
          sum(col("cents")).as("actual_cents"),
          sum(col("pred_cents")).as("pred_cents"),
          sum(col("ape_pm")).as("sum_ape"))
        .select(col("yr"), col("n_months"), col("actual_cents"),
          col("pred_cents"),
          expr("sum_ape div n_months").as("mape_pm"))
        .orderBy("yr")
    }),

    // Year-over-year PRICE/VOLUME revenue bridge (round 10) — the BI
    // waterfall behind q210's growth percentages: the revenue delta
    // decomposed into a volume effect (quantity change at last year's
    // realized price) and a price effect (the remainder, so the two
    // legs are exactly additive — the standard bridge convention).
    // INTEGER-EXACT: revenue in cents, quantities integer, the volume
    // effect a truncating integer ratio ([D5]); one lineitem+orders
    // pass collapses to (year) partials before the year-shift join
    // touches anything.
    "q258_price_volume" -> ((s, dir) => {
      val yearly = t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"),
            year(col("o_orderdate")).as("yr")), Seq("l_orderkey"))
        .groupBy("yr")
        .agg(expr("sum(cast(round(l_extendedprice * 100) as bigint))")
          .as("rev"),
          expr("sum(cast(l_quantity as bigint))").as("qty"))
      val prev = yearly.select((col("yr") + 1).as("yr"),
        col("rev").as("rev_prev"), col("qty").as("qty_prev"))
      yearly.join(prev, Seq("yr")).filter(col("qty_prev") > 0)
        .select(col("yr"), col("rev_prev"), col("rev").as("rev_cur"),
          col("qty_prev"), col("qty").as("qty_cur"),
          (col("rev") - col("rev_prev")).as("delta_cents"),
          expr("((qty - qty_prev) * rev_prev) div qty_prev")
            .as("volume_effect"),
          (col("rev") - col("rev_prev")
            - expr("((qty - qty_prev) * rev_prev) div qty_prev"))
            .as("price_effect"))
        .orderBy("yr")
    }),

    // Rolling 28-day OLS revenue slope (round 10) — q163's trend fit
    // moved onto a sliding window (the trend-change detector a
    // reporting pipeline tracks daily, and the window-family synthesis
    // of the q159 explode-fan-out and the q254/q163 exact-moment
    // regression): each day's cents fan out to the ≤ RollWin target
    // days they inform (constant fan-out, equi-join — no range join,
    // no window over the raw series), per target the five integer
    // moments accumulate map-side, and the slope is the [D5]
    // truncating integer ratio (n·Σxy − Σx·Σy) div (n·Σxx − Σx²) in
    // whole cents/day (x centered at the target day, so |x| ≤ 27 and
    // every moment stays far inside int64 at 1000× this scale).
    // Head-of-series days regress on their partial window (n_win
    // rides along); a degenerate window (one day) is filtered by
    // den > 0, not divided by.
    "q263_rolling_slope" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(expr("cast(datediff(o_orderdate, date'1992-01-01') " +
          "as bigint)").as("dd"))
        .agg(expr("sum(cast(round(o_totalprice * 100) as bigint))")
          .as("cents"))
      val fan = daily
        .select(col("dd"), col("cents"),
          explode(expr(s"sequence(dd, dd + ${RollWin - 1}L)")).as("t"))
        .join(daily.select(col("dd").as("t")), Seq("t"), "left_semi")
        .withColumn("x", col("dd") - col("t"))
      fan.groupBy("t")
        .agg(count(lit(1)).as("n_win"),
          sum(col("x")).as("sx"), sum(col("cents")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("cents")).as("sxy"))
        .withColumn("num", expr("n_win * sxy - sx * sy"))
        .withColumn("den", expr("n_win * sxx - sx * sx"))
        .filter(col("den") > 0)
        .select(col("t").as("dd"), col("n_win"), col("sy").as("win_cents"),
          expr("num div den").as("slope_cents"))
        .orderBy("dd")
    }),

    // MACD momentum indicator (Appel, public method) — the
    // convergence/divergence readout that completes the TA family
    // (q158 EWMA, q159 Bollinger, q310 RSI, q301 drawdown): fast
    // (8-day halving) minus slow (12-day 3/4-decay) truncated
    // exponential means of daily revenue, a 9-day halving signal line
    // over the MACD itself, histogram = MACD − signal. The q158
    // contribution discipline keeps every exponential EXACT: each
    // day's integer cents feed the next HF/HS calendar days at
    // integer weights (2^k halving; 3^k·4^(11−k) for the 3/4 decay —
    // geometric numerators over fixed literal denominators), missing
    // days contribute nothing, only full windows score. The signal
    // stage repeats the trick over the 6dp-quantized MACD
    // (decimal-exact weighted sums [D2]); every emitted double is one
    // fixed division. Three keyed contribution aggs — map-side
    // combinable, no per-day recursion anywhere.
    "q338_macd" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(unix_micros(date_trunc("day", col("o_orderdate")))
          .as("day_us"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      // cents*weight staged through decimal(38,0) ([D2], the q328/q331
      // convention): slow-leg weights reach 4^11 ≈ 4.2e6, so the long
      // product would wrap int64 near daily cents ~2e12 (large SF)
      // while the DuckDB oracle promotes — decimal keeps both exact.
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val fast = daily
        .select(col("day_us"), col("cents"),
          explode(sequence(lit(0), lit(7))).as("k"))
        .select((col("day_us") + col("k") * DayUs).as("day_us"),
          (d38(col("cents")) * expr("shiftleft(cast(1 as bigint), 7 - k)"))
            .as("w"))
        .groupBy("day_us")
        .agg(count(lit(1)).as("nf"), sum(col("w")).as("fnum"))
      val slowW = s"element_at(array(${MacdSlowW.mkString("L,")}L), " +
        "cast(k + 1 as int))"
      val slow = daily
        .select(col("day_us"), col("cents"),
          explode(sequence(lit(0), lit(11))).as("k"))
        .select((col("day_us") + col("k") * DayUs).as("day_us"),
          (d38(col("cents")) * expr(slowW)).as("w"))
        .groupBy("day_us")
        .agg(count(lit(1)).as("ns"), sum(col("w")).as("snum"))
      val m = daily.join(fast, Seq("day_us")).join(slow, Seq("day_us"))
        .filter(col("nf") === 8 && col("ns") === 12)
        .withColumn("macd6", round(col("fnum").cast("double") / 255.0
          - col("snum").cast("double") / lit(MacdSlowDen.toDouble), 6))
      val sig = m
        .select(col("day_us"), col("macd6"),
          explode(sequence(lit(0), lit(8))).as("k"))
        .select((col("day_us") + col("k") * DayUs).as("day_us"),
          (col("macd6").cast(Dec)
            * expr("shiftleft(cast(1 as bigint), 8 - k)")).as("w"))
        .groupBy("day_us")
        .agg(count(lit(1)).as("n9"), sum(col("w")).as("gnum"))
      m.join(sig, Seq("day_us")).filter(col("n9") === 9)
        .withColumn("sig6",
          round(col("gnum").cast("double") / 511.0, 6))
        .select(tsOut(timestamp_micros(col("day_us"))).as("day"),
          col("cents"), col("macd6"), col("sig6"),
          round(col("macd6") - col("sig6"), 6).as("hist6"))
        .orderBy("day")
    }),

    // Optimal single breakpoint — binary segmentation's first step
    // (Scott & Knott / CART split, public textbook): the calendar day
    // that splits the daily-revenue series into two segments with the
    // smallest summed within-segment SSE, with the variance-drop
    // share it buys. q203's CUSUM asks "did the level shift"; this
    // answers WHERE, exactly. Prefix moments (n, Σx, Σx² decimal-
    // staged) come from ONE bounded global window over the
    // calendar-day series (documented class), every candidate day is
    // scored by one shared-string IEEE tree (BreakFormula) on exact
    // moments, and the argmin is the (rounded sse, day) total order —
    // no per-candidate rescan, no quadratic anywhere.
    "q347_breakpoint" -> ((s, dir) => {
      val d19 = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
      val daily = t(s, dir, "orders")
        .groupBy(unix_micros(date_trunc("day", col("o_orderdate")))
          .as("day_us"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val w = Window.orderBy("day_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = daily
        .withColumn("cn", count(lit(1)).over(w))
        .withColumn("cs", sum(col("cents")).over(w))
        .withColumn("cq", sum(d19(col("cents")) * d19(col("cents")))
          .over(w))
      val tot = daily.agg(count(lit(1)).as("tn"),
        sum(col("cents")).as("ts"),
        sum(d19(col("cents")) * d19(col("cents"))).as("tq"))
      pre.crossJoin(broadcast(tot))
        .filter(col("cn") < col("tn"))
        .withColumn("sse_split4", expr(BreakFormula.sse4))
        .orderBy(col("sse_split4").asc, col("day_us").asc)
        .limit(1)
        .select(tsOut(timestamp_micros(col("day_us"))).as("break_day"),
          col("cn").as("n_left"), (col("tn") - col("cn")).as("n_right"),
          expr("(2 * cs + cn) div (2 * cn)").as("mean_left_cents"),
          expr("(2 * (ts - cs) + (tn - cn)) div (2 * (tn - cn))")
            .as("mean_right_cents"),
          col("sse_split4"),
          expr(BreakFormula.sseTot4).as("sse_total4"),
          round(lit(1.0) - col("sse_split4") / expr(BreakFormula.sseTot4),
            4).as("drop4"))
    }),

    // Gumbel extreme-value fit on weekly revenue maxima — the
    // tail-risk readout past q159's 2σ bands and q154's robust
    // z-scores (both ask "is today unusual"; this asks "how big does
    // the worst week in a year get"): block maxima of daily order
    // revenue per epoch-week, method-of-moments Gumbel parameters
    // (β = s·√6/π, μ = x̄ − γβ; Gumbel 1958, public textbook) and the
    // 52-block return level μ − β·ln(−ln(1 − 1/52)). Daily cents are
    // exact integers, weekly maxima exact, the moment row
    // decimal-staged; every derived double is one shared-string IEEE
    // tree (GumbelFormula). Two hash aggs + a one-row fold — the
    // irreducible block-maxima cost at any history length.
    "q336_gumbel_maxima" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val daily = t(s, dir, "orders")
        .groupBy(unix_micros(date_trunc("day", col("o_orderdate")))
          .as("day_us"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val blocks = daily
        .groupBy(expr(s"day_us div ${7 * DayUs}L").as("wk"))
        .agg(max(col("cents")).as("mx"))
      blocks.agg(count(lit(1)).as("n_blocks"), max(col("mx")).as("max_mx"),
          sum(col("mx")).as("s1"), sum(d38(col("mx")) * col("mx")).as("s2"))
        .select(col("n_blocks"), col("max_mx").as("max_cents"),
          expr(GumbelFormula.mu2).as("mu2"),
          expr(GumbelFormula.beta2).as("beta2"),
          expr(GumbelFormula.rl52_2).as("rl52_2"))
    }),

    // Mann–Kendall trend test (Mann 1945 / Kendall, public textbook)
    // on the full daily-revenue series — the DISTRIBUTION-FREE "is
    // there a monotone trend at all" gate in front of the q163 OLS and
    // q289 Theil–Sen slope ESTIMATES: S = Σ_{i<j} sgn(c_j − c_i) over
    // day-ordered pairs, the tie-corrected variance, tau-a, and the
    // ±1 continuity-corrected z. The corpus collapses to the
    // calendar-bounded daily table FIRST, so the pair pass is the
    // q289 bounded half-grid broadcast (documented BNLJ — pair count
    // is a property of the CALENDAR, not the corpus); ties come from
    // the 1D cents histogram; every count is exact (decimal-staged —
    // n(n−1)(2n+5) wants headroom at century calendars), z/tau one
    // shared-string IEEE tree each (MkFormula).
    "q360_mann_kendall" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val a = daily.select(col("day").as("da"), col("cents").as("ca"))
      val b = daily.select(col("day").as("db"), col("cents").as("cb"))
      val sS = a.join(broadcast(b), col("db") > col("da"))
        .agg(sum(when(col("cb") > col("ca"), 1L)
          .when(col("cb") < col("ca"), -1L).otherwise(0L)).as("s_stat"))
      val tie = daily.groupBy("cents").agg(count(lit(1)).as("t"))
        .agg(coalesce(sum(d38(col("t")) * (col("t") - 1)
            * (lit(2) * col("t") + 5)),
          lit(0).cast("decimal(38,0)")).as("tie"))
      val nn = daily.agg(count(lit(1)).as("n"))
      sS.crossJoin(broadcast(tie)).crossJoin(broadcast(nn))
        .withColumn("var18",
          (d38(col("n")) * (col("n") - 1) * (lit(2) * col("n") + 5)
            - col("tie")).cast("long"))
        .select(col("n").as("n_days"), col("s_stat"),
          col("var18").as("var_num18"),
          expr(MkFormula.tau6).as("tau6"),
          expr(MkFormula.z4).as("z4"))
    }),

    // Pettitt change-point test (Pettitt 1979, public method) — the
    // NONPARAMETRIC "where did the level shift" next to q203's CUSUM
    // (which needs a variance scale) and q347's SSE breakpoint (which
    // is mean/L2): U_t = Σ_{i≤t} Σ_{j>t} sgn(c_j − c_i), K = max|U_t|,
    // with the classic min(1, 2·exp(−6K²/(n³+n²))) significance
    // approximation. Each day-ordered pair (i, j, s) contributes +s at
    // rank i and −s at rank j (a difference array), so the whole U
    // curve is ONE prefix sum over the calendar-bounded daily series —
    // the pair pass is the q289 half-grid broadcast (documented BNLJ),
    // the prefix the documented q347 calendar-bounded window class;
    // integer-exact until the final p. Argmax picks by (|U| desc,
    // rank asc) through TakeOrdered — no global sort.
    "q363_pettitt" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val (pool, n) = GlobalRank.rowNumberWithTotal(
        daily, Seq(col("day").asc))
      val r = pool.select(col("rn"), col("day"), col("cents"))
      val a = r.select(col("rn").as("ri"), col("cents").as("ca"))
      val b = r.select(col("rn").as("rj"), col("cents").as("cb"))
      val pairs = a.join(broadcast(b), col("rj") > col("ri"))
        .select(col("ri"), col("rj"),
          when(col("cb") > col("ca"), 1L)
            .when(col("cb") < col("ca"), -1L).otherwise(0L).as("sg"))
      val diff = pairs.select(col("ri").as("rn"), col("sg"))
        .unionAll(pairs.select(col("rj").as("rn"), (-col("sg")).as("sg")))
        .groupBy("rn").agg(sum(col("sg")).as("d"))
      val w = Window.orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      diff.withColumn("u", sum(col("d")).over(w))
        .filter(col("rn") < n)
        .join(r, Seq("rn"))
        .withColumn("k", abs(col("u")))
        .withColumn("nn", lit(n))
        .orderBy(col("k").desc, col("rn").asc)
        .limit(1)
        .select(col("nn").as("n_days"), col("day").as("t_star_day"),
          col("u").as("u_at_t"), col("k").as("k_stat"),
          expr(PettittFormula.p4).as("p4"))
    }),

    // Hurst exponent by rescaled-range analysis (Hurst 1951 /
    // Mandelbrot & Wallis, public textbook) on the daily-revenue
    // series — the long-memory readout the TA family still lacked
    // (q152/q302 measure FIXED-lag correlation; H says whether shocks
    // persist at ALL horizons: H≈0.5 random walk, >0.5 trending,
    // <0.5 mean-reverting). Complete blocks of m ∈ {16,32,64,128}
    // days; within a block the rescaled range R/S stays INTEGER-exact
    // until one sqrt: cumulative deviations scaled by m (Zs_k =
    // m·prefix_k − k·S_b), R·m = max Zs − min Zs, S²·m² = m·Q_b − S_b²
    // — so R/S = (maxZs − minZs)/√(m·Q_b − S_b²). Per-block ln(R/S)
    // 6dp-quantized + decimal-summed [D2]; the ladder's H is the
    // closed-form OLS slope over ln-size, which for the 2× ladder
    // collapses to (3(y₁₂₈−y₁₆) + (y₆₄−y₃₂))/(10·ln 2) — one shared
    // IEEE tree (HurstFormula), no double summation anywhere. All
    // windows are PARTITIONED by block (bounded by m); constant
    // blocks (S = 0) drop, degenerate ladders report NULL.
    "q368_hurst" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val (pool, _) = GlobalRank.rowNumberWithTotal(
        daily, Seq(col("day").asc))
      val r = pool.select(col("rn"), col("cents"))
      val perSize = HurstSizes.map { m =>
        val bl = r.withColumn("b", expr(s"(rn - 1) div ${m}L"))
        val tot = bl.groupBy("b").agg(count(lit(1)).as("cnt"),
            sum(col("cents")).as("sb"),
            sum(d38(col("cents")) * col("cents")).as("qb"))
          .filter(col("cnt") === m)
        val w = Window.partitionBy("b").orderBy("rn")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val z = bl.withColumn("pre", sum(col("cents")).over(w))
          .join(tot, Seq("b"))
          .withColumn("zs", d38(col("pre")) * m
            - d38(col("rn") - col("b") * m) * col("sb"))
          .groupBy("b", "sb", "qb")
          .agg(max(col("zs")).as("zmax"), min(col("zs")).as("zmin"))
          .withColumn("den", d38(lit(m)) * col("qb")
            - d38(col("sb")) * col("sb"))
          .filter(col("den") > 0)
          .withColumn("lnrs", round(log(
            (col("zmax") - col("zmin")).cast("double")
              / sqrt(col("den").cast("double"))), 6).cast(Dets.Dec))
        z.agg(count(lit(1)).as("n_blocks"),
            sum(col("lnrs")).as("s_lnrs"))
          .select(lit(m.toLong).as("block_len"), col("n_blocks"),
            when(col("n_blocks") > 0,
              round(col("s_lnrs").cast("double") / col("n_blocks"), 6))
              .as("mean_lnrs6"))
      }.reduce(_ unionByName _)
      val pv = perSize.agg(HurstSizes.map(m =>
        max(when(col("block_len") === m, col("mean_lnrs6")))
          .as(s"y$m")).head,
        HurstSizes.map(m =>
          max(when(col("block_len") === m, col("mean_lnrs6")))
            .as(s"y$m")).tail: _*)
      perSize.crossJoin(broadcast(pv))
        .select(col("block_len"), col("n_blocks"), col("mean_lnrs6"),
          expr(HurstFormula.h4).as("hurst4"))
        .orderBy("block_len")
    }),

    // Classical decomposition seasonal-strength readout (public
    // textbook; the STL-lite form of Cleveland's decomposition):
    // detrend daily revenue by a centered 7-day moving average
    // (complete windows only), average the detrended series per
    // epoch-weekday (the portable dd % 7 — the q357 convention) to get
    // the SEASONAL component, remainder = detrended − seasonal, and
    // strength = max(0, 1 − var(remainder)/var(detrended)) — q168
    // reports the DOW index levels; this says how much of the
    // around-trend variance the weekly cycle actually EXPLAINS. Trend
    // sums are exact integers via the q337 fan-explode (equi-join, no
    // window); detrended/seasonal/remainder are 6dp-quantized, their
    // squares 6dp-quantized + decimal-summed [D2]; variances and
    // strength are shared-string IEEE trees (SeasonFormula). Emits the
    // 7 per-dow rows with the variance shares attached.
    "q374_seasonal_strength" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(unix_micros(date_trunc("day", col("o_orderdate")))
          .as("day_us"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
        .select(expr("day_us div 86400000000L").as("dd"), col("cents"))
      val fan = daily
        .select(col("dd"), col("cents"),
          explode(sequence(col("dd") - 3, col("dd") + 3)).as("tc"))
        .groupBy("tc")
        .agg(count(lit(1)).as("n_win"), sum(col("cents")).as("t7"))
        .filter(col("n_win") === 7)
      val cen = daily
        .join(fan.select(col("tc").as("dd"), col("t7")), Seq("dd"))
        .withColumn("d6", round(col("cents").cast("double")
          - col("t7").cast("double") / 7.0, 6))
        .withColumn("dow", expr("dd % 7"))
      val sdow = cen.groupBy("dow")
        .agg(count(lit(1)).as("n_days"),
          sum(col("d6").cast(Dets.Dec)).as("sd"))
        .withColumn("s6",
          round(col("sd").cast("double") / col("n_days"), 6))
      val r = cen
        .join(broadcast(sdow.select(col("dow"), col("s6"))), Seq("dow"))
        .withColumn("r6", round(col("d6") - col("s6"), 6))
      val vr = r.agg(count(lit(1)).as("n"),
          sum(col("d6").cast(Dets.Dec)).as("sx"),
          sum(round(col("d6") * col("d6"), 6).cast(Dets.Dec)).as("sxx"),
          sum(col("r6").cast(Dets.Dec)).as("sr"),
          sum(round(col("r6") * col("r6"), 6).cast(Dets.Dec)).as("srr"))
        .select(expr(SeasonFormula.varD6).as("var_d6"),
          expr(SeasonFormula.varR6).as("var_r6"),
          expr(SeasonFormula.strength4).as("strength4"))
      sdow.select(col("dow"), col("n_days"), col("s6").as("s_dow6"))
        .crossJoin(broadcast(vr))
        .orderBy("dow")
    })
  )

  /** q347's split-cost trees over the exact prefix/total moments
    * (cn/cs/cq cumulative count/sum/sum-of-squares at the candidate,
    * tn/ts/tq the totals) — shared text, one IEEE tree each. The
    * filter guarantees tn − cn ≥ 1 so no zero divisor exists. */
  private[operators] object BreakFormula {
    val sse4: String =
      "round((CAST(cq AS DOUBLE) - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)" +
        " / CAST(cn AS DOUBLE)) + (CAST(tq - cq AS DOUBLE)" +
        " - CAST(ts - cs AS DOUBLE) * CAST(ts - cs AS DOUBLE)" +
        " / CAST(tn - cn AS DOUBLE)), 4)"
    val sseTot4: String =
      "round(CAST(tq AS DOUBLE) - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)" +
        " / CAST(tn AS DOUBLE), 4)"
  }

  /** q360's tau/z trees over the exact pair sum `s_stat`, the
    * tie-corrected variance NUMERATOR `var18` (×18 — the /18 stays
    * inside the sqrt so no intermediate rounds), and the day count
    * `n` — shared text, one IEEE tree each. z is NULL when the
    * variance degenerates (constant series). */
  private[operators] object MkFormula {
    private val nD = "CAST(n AS DOUBLE)"
    val tau6: String =
      s"round(CAST(s_stat AS DOUBLE) / ($nD * ($nD - 1.0) / 2.0), 6)"
    val z4: String =
      "CASE WHEN var18 > 0 THEN round((CASE WHEN s_stat > 0 " +
        "THEN CAST(s_stat AS DOUBLE) - 1.0 WHEN s_stat < 0 " +
        "THEN CAST(s_stat AS DOUBLE) + 1.0 ELSE 0.0 END) " +
        "/ sqrt(CAST(var18 AS DOUBLE) / 18.0), 4) END"
  }

  /** q363's significance approximation over the exact max statistic
    * `k` and day count `nn` — capped at 1 (the asymptotic form
    * exceeds 1 for small K). Shared text, one IEEE tree. */
  private[operators] object PettittFormula {
    private val nD = "CAST(nn AS DOUBLE)"
    val p4: String =
      s"round(least(1.0, 2.0 * exp(-6.0 * CAST(k AS DOUBLE) " +
        s"* CAST(k AS DOUBLE) / ($nD * $nD * $nD + $nD * $nD))), 4)"
  }

  /** q368's block-length ladder (powers of two so the OLS slope over
    * ln-size collapses to the fixed-weight HurstFormula contrast).
    * Declared before the oracle map's interpolation sites. */
  private[operators] val HurstSizes = Seq(16, 32, 64, 128)

  /** q368's Hurst slope over the four per-size mean ln(R/S) columns
    * y16..y128: for ln-sizes ln2·{4,5,6,7} the centered OLS weights
    * are ln2·{−1.5,−0.5,0.5,1.5} over denominator 5·ln2², so H =
    * (3(y128−y16) + (y64−y32))/(10·ln 2) — one shared IEEE tree;
    * NULL when any rung of the ladder had no complete block. */
  private[operators] object HurstFormula {
    val h4: String =
      "round((3.0 * (y128 - y16) + (y64 - y32)) / (10.0 * ln(2.0)), 4)"
  }

  /** q374's population-variance and strength trees over the exact
    * decimal moment sums (n, sx/sxx detrended, sr/srr remainder) —
    * shared text, one IEEE tree each; strength is clamped at 0 and
    * NULL on a variance-free detrended series. */
  private[operators] object SeasonFormula {
    private val nD = "CAST(n AS DOUBLE)"
    private def v(s1: String, s2: String) =
      s"(($nD * CAST($s2 AS DOUBLE) " +
        s"- CAST($s1 AS DOUBLE) * CAST($s1 AS DOUBLE)) / ($nD * $nD))"
    val varD6: String = s"round(${v("sx", "sxx")}, 6)"
    val varR6: String = s"round(${v("sr", "srr")}, 6)"
    val strength4: String =
      s"CASE WHEN ${v("sx", "sxx")} > 0 THEN round(greatest(0.0, " +
        s"1.0 - ${v("sr", "srr")} / ${v("sx", "sxx")}), 4) END"
  }

  /** q338's slow-leg weights: (3/4)^k decay over 12 days as exact
    * integer numerators 3^k·4^(11−k); the denominator is their
    * geometric sum 4^12 − 3^12. */
  private val MacdSlowW: Seq[Long] =
    (0 until 12).map(k => math.pow(3, k).toLong * math.pow(4, 11 - k).toLong)
  private val MacdSlowDen: Long = MacdSlowW.sum

  /** q336's Gumbel method-of-moments trees over the exact block-maxima
    * moments (n_blocks, s1 = Σmx, s2 = Σmx²) — shared text, one IEEE
    * tree each. γ is the Euler–Mascheroni constant; β and the return
    * level are NULL on fewer than two blocks (sample sd undefined). */
  private[operators] object GumbelFormula {
    private val n = "CAST(n_blocks AS DOUBLE)"
    private val mean = s"(CAST(s1 AS DOUBLE) / $n)"
    private val sd = s"sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) " +
      s"* CAST(s1 AS DOUBLE) / $n) / ($n - 1.0))"
    private val beta = s"($sd * sqrt(6.0) / pi())"
    private val mu = s"($mean - 0.5772156649015329 * $beta)"
    val mu2: String = s"CASE WHEN n_blocks > 1 THEN round($mu, 2) END"
    val beta2: String = s"CASE WHEN n_blocks > 1 THEN round($beta, 2) END"
    // ln(−ln(1 − 1/52)) pre-evaluated to its shortest-roundtrip double
    // literal: Spark parses `1.0` as DECIMAL (DuckDB as DOUBLE), so
    // the inline expression diverges at ~1e-5 — a constant literal
    // parses bit-identically on both engines
    val rl52_2: String = s"CASE WHEN n_blocks > 1 THEN " +
      s"round($mu - $beta * (-3.9415503865226063E0), 2) END"
  }

  val oracle: Map[String, String] = Map(

    // the same daily cents table, the same ±1/±7 day shifted joins,
    // integer error sums, truncating-div means, one final ratio
    "q395_mase" ->
      """WITH d AS (
        |  SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        |              AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |e1 AS (
        |  SELECT COUNT(*) AS n1, CAST(SUM(abs(a.c - b.c)) AS BIGINT)
        |           AS se1
        |  FROM d a JOIN d b ON a.day_us = b.day_us + 86400000000),
        |e7 AS (
        |  SELECT COUNT(*) AS n7, CAST(SUM(abs(a.c - b.c)) AS BIGINT)
        |           AS se7
        |  FROM d a JOIN d b ON a.day_us = b.day_us + 604800000000)
        |SELECT CAST(n1 AS BIGINT) AS n_naive,
        |       CAST(n7 AS BIGINT) AS n_seasonal,
        |       se1 // n1 AS mae_naive_cents,
        |       se7 // n7 AS mae_seasonal_cents,
        |       ROUND((CAST(se7 AS DOUBLE) / n7)
        |             / (CAST(se1 AS DOUBLE) / n1), 4) AS mase4
        |FROM e1 CROSS JOIN e7""".stripMargin,

    // identical rank spine, adjacent-delta join, 14-frame fan-out
    // (BETWEEN mirror of the explode), exact integer gain/loss sums
    "q310_rsi" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |rk AS (SELECT day, cents,
         |              ROW_NUMBER() OVER (ORDER BY day ASC) AS rn
         |       FROM daily),
         |dlt AS (
         |  SELECT a.rn,
         |         GREATEST(a.cents - b.cents, 0) AS g,
         |         GREATEST(b.cents - a.cents, 0) AS l
         |  FROM rk a JOIN rk b ON b.rn = a.rn - 1),
         |win AS (
         |  SELECT t.rn, CAST(COUNT(*) AS BIGINT) AS nf,
         |         CAST(SUM(d.g) AS BIGINT) AS sg,
         |         CAST(SUM(d.l) AS BIGINT) AS sl
         |  FROM dlt d JOIN rk t ON t.rn BETWEEN d.rn AND d.rn + ${RsiWin - 1}
         |  GROUP BY 1
         |  HAVING COUNT(*) = $RsiWin)
         |SELECT rk.day, win.sg AS gain_cents, win.sl AS loss_cents,
         |       CASE WHEN win.sg + win.sl > 0 THEN
         |         ROUND(100.0 * CAST(win.sg AS DOUBLE)
         |           / CAST(win.sg + win.sl AS DOUBLE), 6) END AS rsi6
         |FROM win JOIN rk ON rk.rn = win.rn
         |ORDER BY day ASC NULLS FIRST""".stripMargin,

    // identical daily collapse, running-peak window, islands streak;
    // dd ≥ 0 so the rounded ratio can never hit IEEE −0.0
    "q301_drawdown" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT day, cents,
        |         MAX(cents) OVER (ORDER BY day ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS peak,
        |         ROW_NUMBER() OVER (ORDER BY day ASC) AS rn
        |  FROM daily),
        |dd AS (SELECT day, rn, peak, peak - cents AS dd FROM d),
        |heads AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(MAX(dd) AS BIGINT) AS max_dd_cents,
        |         MAX(ROUND(CAST(dd AS DOUBLE) / CAST(peak AS DOUBLE), 6))
        |           AS maxdd_pct6
        |  FROM dd),
        |u AS (SELECT rn, ROW_NUMBER() OVER (ORDER BY day ASC) AS rnu
        |      FROM dd WHERE dd > 0),
        |st AS (
        |  SELECT CAST(MAX(len) AS BIGINT) AS longest
        |  FROM (SELECT rn - rnu AS grp, COUNT(*) AS len
        |        FROM u GROUP BY 1))
        |SELECT heads.n_days, heads.max_dd_cents, heads.maxdd_pct6,
        |       COALESCE(st.longest, CAST(0 AS BIGINT))
        |         AS longest_under_days
        |FROM heads CROSS JOIN st""".stripMargin,

    // identical daily collapse, half-grid slope pass, value-histogram
    // rank pick; `+ 0` normalizes a −0.0 round (q63 precedent)
    "q289_theil_sen" ->
      """WITH daily AS (
        |  SELECT datediff('day', DATE '1995-01-01', o_orderdate) AS d,
        |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders WHERE year(o_orderdate) = 1995
        |  GROUP BY 1),
        |sl AS (
        |  SELECT CAST(b.cents - a.cents AS DOUBLE)
        |       / CAST(b.d - a.d AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON b.d > a.d),
        |h AS (SELECT slope, COUNT(*) AS cnt FROM sl GROUP BY 1),
        |cum AS (
        |  SELECT slope, cnt,
        |         SUM(cnt) OVER (ORDER BY slope ASC) AS cum,
        |         SUM(cnt) OVER () AS n
        |  FROM h),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
        |SELECT nd.n_days, CAST(MAX(cum.n) AS BIGINT) AS n_pairs,
        |       ROUND((MIN(CASE WHEN cum >= (n + 1) // 2 THEN slope END)
        |            + MIN(CASE WHEN cum >= n // 2 + 1 THEN slope END))
        |             / 2, 6) + 0 AS sen_slope6
        |FROM cum CROSS JOIN nd
        |GROUP BY nd.n_days""".stripMargin,

    // identical grid collapse, ORDER BY-list profiles, permille
    // normalization, bounded pair join, and the mirrored nested-fold
    // DP (exact BIGINT costs — no IEEE tree to share)
    "q295_dtw" ->
      s"""WITH monthly AS (
         |  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
         |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS c
         |  FROM orders GROUP BY 1, 2),
         |prof AS (
         |  SELECT yr, list(c ORDER BY mon ASC) AS cs,
         |         CAST(SUM(c) AS BIGINT) AS tot, COUNT(*) AS nm
         |  FROM monthly GROUP BY 1),
         |p AS (
         |  SELECT CAST(yr AS INT) AS yr,
         |         list_transform(cs, c -> c * 1000 // tot) AS p
         |  FROM prof WHERE nm = 12),
         |pr AS (
         |  SELECT a.yr AS yr_a, a.p AS pa, b.yr AS yr_b, b.p AS pb
         |  FROM p a JOIN p b ON a.yr < b.yr)
         |SELECT yr_a, yr_b,
         |       CAST(list_sum(list_transform(range(1, 13),
         |         i -> abs(pa[i] - pb[i]))) AS BIGINT) AS l1,
         |       CAST(${DtwExpr.duck} AS BIGINT) AS dtw
         |FROM pr
         |ORDER BY yr_a ASC NULLS FIRST, yr_b ASC NULLS FIRST"""
        .stripMargin,

    // identical daily collapse, list window, sorted picks, integer
    // fence — DuckDB's list() window mirrors collect_list exactly
    "q294_hampel" ->
      """WITH daily AS (
        |  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate)
        |           AS BIGINT) AS d,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT d, cents,
        |         list(cents) OVER (ORDER BY d ASC
        |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win
        |  FROM daily),
        |m AS (
        |  SELECT d, cents, win, list_sort(win)[4] AS med
        |  FROM w WHERE len(win) = 7),
        |mm AS (
        |  SELECT d, cents, med,
        |         list_sort(list_transform(win, x -> abs(x - med)))[4]
        |           AS mad
        |  FROM m)
        |SELECT d, cents, med, mad,
        |       CAST(CASE WHEN abs(cents - med) > 3 * mad
        |            THEN 1 ELSE 0 END AS INT) AS is_out
        |FROM mm
        |ORDER BY d ASC NULLS FIRST""".stripMargin,

    "q158_ewma" ->
      """WITH d AS (
        |  SELECT epoch_us(date_trunc('day', ts)) AS day_us, COUNT(*) AS c
        |  FROM events GROUP BY 1),
        |e AS (
        |  SELECT a.day_us, a.c,
        |         CAST(SUM(b.c * (CAST(1 AS BIGINT) <<
        |           CAST(7 - ((a.day_us - b.day_us) // 86400000000) AS INT)))
        |           AS BIGINT) AS num
        |  FROM d a JOIN d b
        |    ON b.day_us BETWEEN a.day_us - 7 * 86400000000 AND a.day_us
        |  GROUP BY 1, 2)
        |SELECT make_timestamp(day_us) AS day, c AS n_events, num,
        |       CAST(num AS DOUBLE) / 256.0 AS ewma
        |FROM e ORDER BY day ASC NULLS FIRST""".stripMargin,

    "q159_bollinger" ->
      """WITH d AS (
        |  SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us,
        |         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT a.day_us, a.cents, COUNT(*) AS n_win,
        |         SUM(b.cents) AS sx,
        |         SUM(CAST(b.cents AS HUGEINT) * b.cents) AS sxx
        |  FROM d a JOIN d b
        |    ON b.day_us BETWEEN a.day_us - 7 * 86400000000
        |                    AND a.day_us - 86400000000
        |  GROUP BY 1, 2),
        |z AS (
        |  SELECT day_us, cents, n_win,
        |         CAST(sx AS DOUBLE) / n_win AS mean,
        |         SQRT(GREATEST(CAST(0 AS DOUBLE),
        |           CAST(sxx AS DOUBLE) / n_win
        |             - (CAST(sx AS DOUBLE) / n_win)
        |               * (CAST(sx AS DOUBLE) / n_win))) AS sd
        |  FROM w WHERE n_win = 7)
        |SELECT make_timestamp(day_us) AS day, CAST(cents AS BIGINT) AS cents,
        |       ROUND(CASE WHEN sd != 0 THEN (cents - mean) / sd END, 4) AS z4,
        |       CAST(ABS(cents - mean) > 2 * sd AS INT) AS breach
        |FROM z ORDER BY day ASC NULLS FIRST""".stripMargin,

    "q160_gap_fill" ->
      """WITH d AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |spine AS (
        |  SELECT UNNEST(generate_series((SELECT MIN(day) FROM d),
        |                                (SELECT MAX(day) FROM d),
        |                                INTERVAL 1 DAY)) AS day),
        |j AS (
        |  SELECT s.day, d.cents FROM spine s LEFT JOIN d ON s.day = d.day)
        |SELECT day,
        |       CAST(last_value(cents IGNORE NULLS) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cents_filled,
        |       CAST(cents IS NULL AS INT) AS was_gap
        |FROM j ORDER BY day ASC NULLS FIRST""".stripMargin,

    "q163_trend" ->
      """WITH yr AS (
        |  SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS y,
        |         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |st AS (
        |  SELECT n_name, COUNT(*) AS n, SUM(y) AS sy, SUM(v) AS sv,
        |         SUM(CAST(y AS HUGEINT) * y) AS syy,
        |         SUM(CAST(y AS HUGEINT) * v) AS syv
        |  FROM yr GROUP BY 1),
        |f AS (
        |  SELECT n_name, n,
        |         CAST(syy AS DOUBLE) * n
        |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS den,
        |         CAST(syv AS DOUBLE) * n
        |           - CAST(sy AS DOUBLE) * CAST(sv AS DOUBLE) AS snum,
        |         CAST(sv AS DOUBLE) * CAST(syy AS DOUBLE)
        |           - CAST(sy AS DOUBLE) * CAST(syv AS DOUBLE) AS inum
        |  FROM st)
        |SELECT n_name, n AS n_years,
        |       CAST(ROUND(CASE WHEN den != 0 THEN snum / den END)
        |            AS BIGINT) AS slope_cents,
        |       CAST(ROUND(CASE WHEN den != 0 THEN inum / den END)
        |            AS BIGINT) AS intercept_cents
        |FROM f ORDER BY n_name ASC NULLS FIRST""".stripMargin,

    "q203_cusum_shift" ->
      """WITH d AS (
        |  SELECT epoch_us(date_trunc('day', ts)) AS day_us, COUNT(*) AS c
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT day_us, c,
        |    SUM(c) OVER (ORDER BY day_us) AS cumc,
        |    ROW_NUMBER() OVER (ORDER BY day_us) AS idx,
        |    SUM(c) OVER () AS tot, COUNT(*) OVER () AS nd
        |  FROM d),
        |s AS (
        |  -- + 0 normalizes -0.0 (Spark's BigDecimal round never emits it)
        |  SELECT day_us, c,
        |    ROUND(CAST(cumc AS DOUBLE)
        |          - idx * (CAST(tot AS DOUBLE) / nd), 4) + 0 AS s4
        |  FROM r)
        |SELECT make_timestamp(day_us) AS day, c AS n_events, s4,
        |       abs(s4) = (SELECT MAX(abs(s4)) FROM s) AS is_peak
        |FROM s ORDER BY day ASC NULLS FIRST""".stripMargin,

    "q210_yoy_growth" ->
      """WITH yr AS (
        |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
        |         SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT a.n_name, a.yr, CAST(a.rev AS DOUBLE) AS rev,
        |       ROUND(CAST(a.rev - b.rev AS DOUBLE)
        |             / CAST(b.rev AS DOUBLE) * 100, 4) AS yoy_pct
        |FROM yr a LEFT JOIN yr b
        |  ON a.n_name = b.n_name AND a.yr = b.yr + 1
        |ORDER BY a.n_name ASC NULLS FIRST, a.yr ASC NULLS FIRST""".stripMargin,

    // the SAX replay: identical cents staging, integer segment ids and
    // micro-unit PAA means, HUGEINT moment pair, the same double
    // mean/std formula and breakpoint CASE over the rounded z
    "q256_sax_paa" ->
      """WITH daily AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |         CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1, 2),
        |segs AS (
        |  SELECT yr, CAST(((doy - 1) * 8) // 366 AS BIGINT) AS seg,
        |         CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(cents) AS BIGINT) AS segc
        |  FROM daily GROUP BY 1, 2),
        |su AS (SELECT yr, seg, n_days,
        |              CAST((segc * 10000) // n_days AS BIGINT) AS u
        |       FROM segs),
        |ystat AS (
        |  SELECT yr, COUNT(*) AS nseg,
        |         SUM(CAST(u AS HUGEINT)) AS sm,
        |         SUM(CAST(u AS HUGEINT) * u) AS sm2
        |  FROM su GROUP BY 1),
        |ys AS (
        |  SELECT yr, CAST(sm AS DOUBLE) / nseg AS mean,
        |         SQRT(CAST(CAST(nseg AS HUGEINT) * sm2 - sm * sm
        |              AS DOUBLE)) / nseg AS std
        |  FROM ystat),
        |z AS (
        |  SELECT s.yr, s.seg, s.n_days,
        |         ROUND(s.u / 1000000.0, 4) AS segmean4,
        |         ROUND(CASE WHEN y.std > 0
        |               THEN (CAST(s.u AS DOUBLE) - y.mean) / y.std
        |               ELSE 0 END, 4) AS z4
        |  FROM su s JOIN ys y USING (yr))
        |SELECT yr, seg, n_days, segmean4, z4,
        |       CASE WHEN z4 < -0.6745 THEN 'a' WHEN z4 < 0 THEN 'b'
        |            WHEN z4 < 0.6745 THEN 'c' ELSE 'd' END AS sax
        |FROM z
        |ORDER BY yr ASC NULLS FIRST, seg ASC NULLS FIRST""".stripMargin,

    // the backtest replay: identical cents staging, the same growth
    // scaling and truncating permille error arithmetic (all operands
    // non-negative, so // and div agree)
    "q257_forecast_backtest" ->
      """WITH monthly AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |         CAST(month(o_orderdate) AS INT) AS mo,
        |         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1, 2),
        |tot AS (SELECT yr, CAST(SUM(cents) AS BIGINT) AS tot
        |        FROM monthly GROUP BY 1),
        |growth AS (
        |  SELECT a.yr + 1 AS yr, a.tot AS t1, b.tot AS t2
        |  FROM tot a JOIN tot b ON b.yr = a.yr - 1
        |  WHERE b.tot > 0),
        |pred AS (
        |  SELECT m.yr + 1 AS yr, m.mo,
        |         CAST((CAST(m.cents AS HUGEINT) * g.t1) // g.t2
        |              AS BIGINT) AS pred_cents
        |  FROM monthly m JOIN growth g ON g.yr = m.yr + 1),
        |bt AS (
        |  SELECT m.yr, m.mo, m.cents, p.pred_cents,
        |         (1000 * abs(p.pred_cents - m.cents)) // m.cents AS ape_pm
        |  FROM monthly m JOIN pred p ON p.yr = m.yr AND p.mo = m.mo
        |  WHERE m.cents > 0)
        |SELECT yr, COUNT(*) AS n_months,
        |       CAST(SUM(cents) AS BIGINT) AS actual_cents,
        |       CAST(SUM(pred_cents) AS BIGINT) AS pred_cents,
        |       CAST(SUM(ape_pm) // COUNT(*) AS BIGINT) AS mape_pm
        |FROM bt GROUP BY 1
        |ORDER BY yr ASC NULLS FIRST""".stripMargin,

    // the bridge replay: identical cents/quantity staging; the volume
    // effect can be NEGATIVE, so the division is the sign-explicit
    // truncation (DuckDB // floors on negatives, Spark div truncates)
    "q258_price_volume" ->
      """WITH yearly AS (
        |  SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
        |         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
        |              AS BIGINT) AS rev,
        |         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1),
        |j AS (
        |  SELECT c.yr, p.rev AS rev_prev, c.rev AS rev_cur,
        |         p.qty AS qty_prev, c.qty AS qty_cur,
        |         (c.qty - p.qty) * p.rev AS vnum
        |  FROM yearly c JOIN yearly p ON p.yr = c.yr - 1
        |  WHERE p.qty > 0),
        |v AS (
        |  SELECT yr, rev_prev, rev_cur, qty_prev, qty_cur,
        |         rev_cur - rev_prev AS delta_cents,
        |         CAST(CASE WHEN vnum < 0 THEN -((-vnum) // qty_prev)
        |              ELSE vnum // qty_prev END AS BIGINT) AS volume_effect
        |  FROM j)
        |SELECT yr, rev_prev, rev_cur, qty_prev, qty_cur, delta_cents,
        |       volume_effect,
        |       delta_cents - volume_effect AS price_effect
        |FROM v
        |ORDER BY yr ASC NULLS FIRST""".stripMargin,

    // the rolling-slope replay: the fan-out as a BETWEEN join (the
    // algorithm-independent spec of the same window), identical
    // centered-x moments and the sign-explicit truncating slope
    "q263_rolling_slope" ->
      s"""WITH daily AS (
         |  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate)
         |              AS BIGINT) AS dd,
         |         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
         |  FROM orders GROUP BY 1),
         |f AS (
         |  SELECT t.dd AS t, d.dd, d.cents, d.dd - t.dd AS x
         |  FROM daily d JOIN daily t
         |    ON d.dd BETWEEN t.dd - ${RollWin - 1} AND t.dd),
         |m AS (
         |  SELECT t, COUNT(*) AS n_win, SUM(x) AS sx,
         |         CAST(SUM(cents) AS BIGINT) AS sy,
         |         SUM(x * x) AS sxx, CAST(SUM(x * cents) AS BIGINT) AS sxy
         |  FROM f GROUP BY 1),
         |v AS (
         |  SELECT t, n_win, sy,
         |         n_win * sxy - sx * sy AS num,
         |         n_win * sxx - sx * sx AS den
         |  FROM m)
         |SELECT t AS dd, CAST(n_win AS BIGINT) AS n_win,
         |       sy AS win_cents,
         |       CAST(CASE WHEN num < 0 THEN -((-num) // den)
         |            ELSE num // den END AS BIGINT) AS slope_cents
         |FROM v WHERE den > 0
         |ORDER BY dd ASC NULLS FIRST""".stripMargin,

    // the breakpoint replay: same prefix-moment window, SAME
    // BreakFormula trees, same (rounded sse, day) argmin order
    "q347_breakpoint" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us,
         |         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |tot AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS tn,
         |         CAST(SUM(cents) AS BIGINT) AS ts,
         |         SUM(CAST(cents AS HUGEINT) * cents) AS tq
         |  FROM daily),
         |pre AS (
         |  SELECT day_us, cents,
         |         COUNT(*) OVER wkw AS cn,
         |         SUM(cents) OVER wkw AS cs,
         |         SUM(CAST(cents AS HUGEINT) * cents) OVER wkw AS cq
         |  FROM daily
         |  WINDOW wkw AS (ORDER BY day_us ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |sc AS (
         |  SELECT day_us, cn, cs, tn, ts,
         |         ${BreakFormula.sse4} AS sse_split4,
         |         ${BreakFormula.sseTot4} AS sse_total4
         |  FROM pre, tot WHERE cn < tn)
         |SELECT make_timestamp(day_us) AS break_day,
         |       CAST(cn AS BIGINT) AS n_left,
         |       CAST(tn - cn AS BIGINT) AS n_right,
         |       CAST((2 * cs + cn) // (2 * cn) AS BIGINT)
         |         AS mean_left_cents,
         |       CAST((2 * (ts - cs) + (tn - cn)) // (2 * (tn - cn))
         |         AS BIGINT) AS mean_right_cents,
         |       sse_split4, sse_total4,
         |       ROUND(1.0 - sse_split4 / sse_total4, 4) AS drop4
         |FROM sc
         |ORDER BY sse_split4 ASC, day_us ASC LIMIT 1""".stripMargin,

    // the exponential replay: q158's range self-join form (identical
    // arithmetic to the Spark side's contribution explode — integer
    // weights on exact cents, lag looked up from the day gap), the
    // slow weights as a VALUES lookup, the signal leg a second
    // self-join over the 6dp-quantized MACD decimals
    "q338_macd" -> {
      val sw = MacdSlowW.zipWithIndex
        .map { case (w, k) => s"($k, $w)" }.mkString(", ")
      s"""WITH d AS (
         |  SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us,
         |         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |sw(k, w) AS (VALUES $sw),
         |fast AS (
         |  SELECT a.day_us, COUNT(*) AS nf,
         |         SUM(CAST(b.cents AS HUGEINT) * (CAST(1 AS BIGINT) <<
         |           CAST(7 - ((a.day_us - b.day_us) // ${DayUs}) AS INT)))
         |           AS fnum
         |  FROM d a JOIN d b
         |    ON b.day_us BETWEEN a.day_us - 7 * ${DayUs} AND a.day_us
         |  GROUP BY 1),
         |slow AS (
         |  SELECT a.day_us, COUNT(*) AS ns,
         |         SUM(CAST(b.cents AS HUGEINT) * sw.w) AS snum
         |  FROM d a JOIN d b
         |    ON b.day_us BETWEEN a.day_us - 11 * ${DayUs} AND a.day_us
         |  JOIN sw ON sw.k = (a.day_us - b.day_us) // ${DayUs}
         |  GROUP BY 1),
         |m AS (
         |  SELECT d.day_us, d.cents,
         |         ROUND(CAST(fnum AS DOUBLE) / 255.0
         |           - CAST(snum AS DOUBLE) / ${MacdSlowDen}.0, 6) AS macd6
         |  FROM d JOIN fast USING (day_us) JOIN slow USING (day_us)
         |  WHERE nf = 8 AND ns = 12),
         |sig AS (
         |  SELECT a.day_us, COUNT(*) AS n9,
         |         SUM(CAST(b.macd6 AS DECIMAL(38,6))
         |           * (CAST(1 AS BIGINT) <<
         |              CAST(8 - ((a.day_us - b.day_us) // ${DayUs})
         |                AS INT))) AS gnum
         |  FROM m a JOIN m b
         |    ON b.day_us BETWEEN a.day_us - 8 * ${DayUs} AND a.day_us
         |  GROUP BY 1),
         |f AS (
         |  SELECT m.day_us, m.cents, m.macd6,
         |         ROUND(CAST(gnum AS DOUBLE) / 511.0, 6) AS sig6
         |  FROM m JOIN sig USING (day_us)
         |  WHERE n9 = 9)
         |SELECT make_timestamp(day_us) AS day, cents, macd6, sig6,
         |       ROUND(macd6 - sig6, 6) AS hist6
         |FROM f ORDER BY day ASC NULLS FIRST""".stripMargin
    },

    // the block-maxima replay: same epoch-week blocks (epoch_us //
    // 7 days), HUGEINT moment staging, the SAME GumbelFormula trees
    "q336_gumbel_maxima" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(date_trunc('day', o_orderdate))
         |           // ${7 * DayUs} AS wk,
         |         epoch_us(date_trunc('day', o_orderdate)) AS day_us,
         |         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1, 2),
         |blocks AS (SELECT wk, MAX(cents) AS mx FROM daily GROUP BY 1),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         |         MAX(mx) AS max_mx,
         |         CAST(SUM(mx) AS BIGINT) AS s1,
         |         SUM(CAST(mx AS HUGEINT) * mx) AS s2
         |  FROM blocks)
         |SELECT n_blocks, max_mx AS max_cents,
         |       ${GumbelFormula.mu2} AS mu2,
         |       ${GumbelFormula.beta2} AS beta2,
         |       ${GumbelFormula.rl52_2} AS rl52_2
         |FROM m""".stripMargin,

    // identical daily collapse, half-grid sign pass, tie histogram,
    // HUGEINT variance staging, and the SAME MkFormula trees
    "q360_mann_kendall" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
         |  FROM orders GROUP BY 1),
         |ss AS (
         |  SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
         |                       WHEN b.cents < a.cents THEN -1
         |                       ELSE 0 END) AS BIGINT) AS s_stat
         |  FROM daily a JOIN daily b ON b.day > a.day),
         |tie AS (
         |  SELECT COALESCE(SUM(CAST(t AS HUGEINT) * (t - 1)
         |           * (2 * t + 5)), 0) AS tie
         |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
         |        FROM daily GROUP BY cents) z),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
         |m AS (
         |  SELECT s_stat, n,
         |         CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - tie
         |           AS BIGINT) AS var18
         |  FROM ss CROSS JOIN tie CROSS JOIN nn)
         |SELECT CAST(n AS BIGINT) AS n_days, s_stat,
         |       var18 AS var_num18,
         |       ${MkFormula.tau6} AS tau6,
         |       ${MkFormula.z4} AS z4
         |FROM m""".stripMargin,

    // identical daily collapse + ranking, the same difference-array
    // pair fold, window prefix, (|U| desc, rank asc) pick, and the
    // SAME capped PettittFormula tree
    "q363_pettitt" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
         |  FROM orders GROUP BY 1),
         |r AS (
         |  SELECT day, cents,
         |         ROW_NUMBER() OVER (ORDER BY day ASC) AS rn
         |  FROM daily),
         |p AS (
         |  SELECT a.rn AS ri, b.rn AS rj,
         |         CAST(CASE WHEN b.cents > a.cents THEN 1
         |                   WHEN b.cents < a.cents THEN -1
         |                   ELSE 0 END AS BIGINT) AS sg
         |  FROM r a JOIN r b ON b.rn > a.rn),
         |d AS (
         |  SELECT rn, CAST(SUM(sg) AS BIGINT) AS d
         |  FROM (SELECT ri AS rn, sg FROM p
         |        UNION ALL SELECT rj AS rn, -sg FROM p) z
         |  GROUP BY 1),
         |u AS (
         |  SELECT rn, CAST(SUM(d) OVER (ORDER BY rn ASC) AS BIGINT) AS u
         |  FROM d),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
         |top AS (
         |  SELECT nn.n AS nn, r.day, u.u, abs(u.u) AS k
         |  FROM u JOIN r USING (rn) CROSS JOIN nn
         |  WHERE u.rn < nn.n
         |  ORDER BY abs(u.u) DESC, u.rn ASC LIMIT 1)
         |SELECT nn AS n_days, day AS t_star_day, u AS u_at_t,
         |       CAST(k AS BIGINT) AS k_stat,
         |       ${PettittFormula.p4} AS p4
         |FROM top""".stripMargin,

    // identical daily collapse + ranking, per-size block CTEs with the
    // same scaled-deviation integers (HUGEINT), 6dp decimal ln(R/S)
    // sums, and the SAME HurstFormula contrast
    "q368_hurst" -> {
      val perM = HurstSizes.map { m =>
        s"""b$m AS (
           |  SELECT rn, cents, (rn - 1) // $m AS b FROM r),
           |t$m AS (
           |  SELECT b, COUNT(*) AS cnt, CAST(SUM(cents) AS BIGINT) AS sb,
           |         SUM(CAST(cents AS HUGEINT) * cents) AS qb
           |  FROM b$m GROUP BY 1 HAVING COUNT(*) = $m),
           |z$m AS (
           |  SELECT x.b, t.sb, t.qb,
           |         MAX(CAST($m AS HUGEINT) * x.pre
           |             - (x.rn - x.b * $m) * t.sb) AS zmax,
           |         MIN(CAST($m AS HUGEINT) * x.pre
           |             - (x.rn - x.b * $m) * t.sb) AS zmin
           |  FROM (SELECT b, rn,
           |               SUM(cents) OVER (PARTITION BY b
           |                 ORDER BY rn ASC) AS pre
           |        FROM b$m) x
           |  JOIN t$m t USING (b) GROUP BY 1, 2, 3),
           |l$m AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
           |         SUM(CAST(ROUND(LN(CAST(zmax - zmin AS DOUBLE)
           |           / SQRT(CAST($m * qb - CAST(sb AS HUGEINT) * sb
           |             AS DOUBLE))), 6) AS DECIMAL(38,6))) AS s_lnrs
           |  FROM z$m
           |  WHERE $m * qb - CAST(sb AS HUGEINT) * sb > 0),
           |row$m AS (
           |  SELECT CAST($m AS BIGINT) AS block_len, n_blocks,
           |         CASE WHEN n_blocks > 0 THEN
           |           ROUND(CAST(s_lnrs AS DOUBLE) / n_blocks, 6)
           |         END AS mean_lnrs6
           |  FROM l$m)""".stripMargin
      }.mkString(",\n")
      val union = HurstSizes
        .map(m => s"SELECT * FROM row$m").mkString("\nUNION ALL\n")
      val ys = HurstSizes.map(m =>
        s"MAX(CASE WHEN block_len = $m THEN mean_lnrs6 END) AS y$m")
        .mkString(",\n         ")
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
         |  FROM orders GROUP BY 1),
         |r AS (
         |  SELECT cents,
         |         ROW_NUMBER() OVER (ORDER BY day ASC) AS rn
         |  FROM daily),
         |$perM,
         |allrows AS ($union),
         |pv AS (
         |  SELECT $ys
         |  FROM allrows)
         |SELECT a.block_len, a.n_blocks, a.mean_lnrs6,
         |       ${HurstFormula.h4} AS hurst4
         |FROM allrows a CROSS JOIN pv
         |ORDER BY block_len ASC NULLS FIRST""".stripMargin
    },

    // identical daily fan (complete 7-day windows), dd % 7 weekday,
    // 6dp quantization at every stage, the SAME SeasonFormula trees
    "q374_seasonal_strength" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(date_trunc('day', o_orderdate))
         |           // 86400000000 AS dd,
         |         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |fan AS (
         |  SELECT tc, COUNT(*) AS n_win,
         |         CAST(SUM(cents) AS BIGINT) AS t7
         |  FROM (SELECT dd, cents, unnest(range(dd - 3, dd + 4)) AS tc
         |        FROM daily) x
         |  GROUP BY 1 HAVING COUNT(*) = 7),
         |cen AS (
         |  SELECT d.dd, d.dd % 7 AS dow,
         |         ROUND(CAST(d.cents AS DOUBLE)
         |           - CAST(f.t7 AS DOUBLE) / 7.0, 6) AS d6
         |  FROM daily d JOIN fan f ON f.tc = d.dd),
         |sdow AS (
         |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
         |         ROUND(CAST(SUM(CAST(d6 AS DECIMAL(38,6))) AS DOUBLE)
         |           / COUNT(*), 6) AS s6
         |  FROM cen GROUP BY 1),
         |r AS (
         |  SELECT c.d6, ROUND(c.d6 - s.s6, 6) AS r6
         |  FROM cen c JOIN sdow s USING (dow)),
         |vr AS (
         |  SELECT COUNT(*) AS n,
         |         SUM(CAST(d6 AS DECIMAL(38,6))) AS sx,
         |         SUM(CAST(ROUND(d6 * d6, 6) AS DECIMAL(38,6))) AS sxx,
         |         SUM(CAST(r6 AS DECIMAL(38,6))) AS sr,
         |         SUM(CAST(ROUND(r6 * r6, 6) AS DECIMAL(38,6))) AS srr
         |  FROM r),
         |st AS (
         |  SELECT ${SeasonFormula.varD6} AS var_d6,
         |         ${SeasonFormula.varR6} AS var_r6,
         |         ${SeasonFormula.strength4} AS strength4
         |  FROM vr)
         |SELECT s.dow, s.n_days, s.s6 AS s_dow6,
         |       st.var_d6, st.var_r6, st.strength4
         |FROM sdow s CROSS JOIN st
         |ORDER BY dow ASC NULLS FIRST""".stripMargin
  )
}
