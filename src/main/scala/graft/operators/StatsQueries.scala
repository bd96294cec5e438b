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

  /** q297's bootstrap geometry: 200 seeded replicates; the 2.5% / 97.5%
    * bounds are the 5th / 196th smallest replicate totals (⌈αB⌉ /
    * ⌈(1−α)B⌉ of B = 200), mirrored in the oracle as literals. */
  private val BootB = 200L
  private val BootLoRank = 5L
  private val BootHiRank = 196L

  /** q300's sign-flip replicate count; p uses the add-one estimator
    * (1 + #{|T_b| ≥ |T0|}) / (B + 1), exact rationals until one final
    * rounded division. */
  private val PermB = 200L

  /** q302's portmanteau depth (ACF lags 1..7 — one week of daily
    * autocorrelation structure). */
  private val LbMaxLag = 7L

  /** q375's order-statistic count (top-k for the Hill sum; the k+1-th
    * is the threshold). Declared before the oracle map interpolates. */
  private val HillK = 100

  /** q380's focus source (q370/q372's convention). */
  private val WassFocus = "src0"

  /** q385's SPRT design (Wald 1945, public textbook): H0 p=0.10 vs
    * H1 p=0.15 purchase rate, α = β = 0.05. Per-event log-likelihood
    * increments and the decision boundary are pre-quantized to exact
    * integer ppm so the walk is an integer cumSum [D5]:
    *  ln(0.15/0.10)·1e6 = ln(1.5)·1e6  → 405465
    *  ln(0.85/0.90)·1e6               → −57158
    *  ln((1−β)/α)·1e6 = ln(19)·1e6    → 2944439 (symmetric lower −A). */
  private val SprtIncP = 405465L
  private val SprtIncN = -57158L
  private val SprtA = 2944439L

  /** q394's Friedman trees over (b, k, ssr2 = Σ(2R_j)²): χ²_F =
    * 3·ssr2/(b·k·(k+1)) − 3·b·(k+1), and — because k = 5 langs is
    * pinned by the fixture so df = k−1 = 4 is even — the χ²(4)
    * survival has the closed form e^(−x/2)·(1 + x/2). NULL on zero
    * complete blocks. */
  private[operators] object FriedmanFormula {
    private val x = "(3.0 * CAST(ssr2 AS DOUBLE) " +
      "/ (CAST(b AS DOUBLE) * CAST(k AS DOUBLE) " +
      "* (CAST(k AS DOUBLE) + 1.0)) " +
      "- 3.0 * CAST(b AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))"
    val chi24: String =
      s"round(CASE WHEN b > 0 AND k > 1 THEN $x END, 4)"
    val p6: String = s"round(CASE WHEN b > 0 AND k > 1 THEN " +
      s"exp(-($x) / 2.0) * (1.0 + ($x) / 2.0) END, 6)"
  }

  /** q391's ANOVA effect-size trees over (k, nn, s1, s2, sb) — all
    * exact decimal stages cast once to double; ω² NULL-guards the
    * degenerate one-group / zero-variance cases. */
  private[operators] object EtaFormula {
    private val cm = "(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) " +
      "/ CAST(nn AS DOUBLE))"
    private val sst = s"(CAST(s2 AS DOUBLE) - $cm)"
    private val ssb = s"(CAST(sb AS DOUBLE) - $cm)"
    private val ssw = s"($sst - $ssb)"
    private val msw = s"($ssw / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))"
    val eta26: String =
      s"round(CASE WHEN $sst > 0 THEN $ssb / $sst END, 6)"
    val omega26: String = s"round(CASE WHEN $sst > 0 AND nn > k THEN " +
      s"($ssb - (CAST(k AS DOUBLE) - 1.0) * $msw) / ($sst + $msw) END, 6)"
  }

  /** q384's Jarque–Bera trees over the one exact-decimal moment row
    * (nn, s1..s4 of integer DOLLARS — scale cancels in the
    * standardized moments): skewness m3/m2^1.5, excess kurtosis
    * m4/m2²−3, JB = n/6·(S² + K²/4), and the χ²(2) survival
    * p = exp(−JB/2) (closed form — no lookup table). One shared
    * string per output, identical IEEE tree in both engines [D3]. */
  private[operators] object JbFormula {
    private val mu = "(CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE))"
    private val r2 = "(CAST(s2 AS DOUBLE) / CAST(nn AS DOUBLE))"
    private val r3 = "(CAST(s3 AS DOUBLE) / CAST(nn AS DOUBLE))"
    private val r4 = "(CAST(s4 AS DOUBLE) / CAST(nn AS DOUBLE))"
    private val m2 = s"($r2 - $mu * $mu)"
    private val m3 = s"($r3 - 3.0 * $mu * $r2 + 2.0 * $mu * $mu * $mu)"
    private val m4 = s"($r4 - 4.0 * $mu * $r3 + 6.0 * $mu * $mu * $r2" +
      s" - 3.0 * $mu * $mu * $mu * $mu)"
    private val sk = s"(CASE WHEN $m2 > 0 THEN $m3 / power($m2, 1.5) END)"
    private val ku =
      s"(CASE WHEN $m2 > 0 THEN $m4 / ($m2 * $m2) - 3.0 END)"
    val skew4 = s"round($sk, 4)"
    val kurt4 = s"round($ku, 4)"
    private val jb =
      s"(CAST(nn AS DOUBLE) / 6.0 * ($sk * $sk + $ku * $ku / 4.0))"
    val jb4 = s"round($jb, 4)"
    val p6 = s"round(exp(-($jb) / 2.0), 6)"
  }


  /** q312's Cochran–Armitage χ² over the exact bin moments (nn, ss,
    * sw1 = Σwn, sw2 = Σw²n, sws = Σws) — shared text, one IEEE tree;
    * the squared sum stages through DOUBLE ((Σwn)² overflows int64
    * past ~1e9 orders). NULL when the variance degenerates (all mass
    * in one band or p̄ ∈ {0, 1}). */
  private[operators] object CaFormula {
    private val pb = "(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))"
    private val tt = s"(CAST(sws AS DOUBLE) - $pb * CAST(sw1 AS DOUBLE))"
    private val vv = s"($pb * (1.0 - $pb) * (CAST(sw2 AS DOUBLE) " +
      s"- CAST(sw1 AS DOUBLE) * CAST(sw1 AS DOUBLE) " +
      s"/ CAST(nn AS DOUBLE)))"
    val chi4: String =
      s"CASE WHEN $vv > 0 THEN round($tt * $tt / $vv, 4) END"
  }

  /** q322's CUPED trees over the pooled/per-arm exact moment sums
    * (n, sx, sy, sxx, syy, sxy, na, nb, sxa, sxb, sya, syb) — shared
    * texts, one IEEE tree each. θ NULL on a constant covariate; ρ²
    * NULL when either variance degenerates; lifts in CENTS (the
    * metric's native integer unit). */
  private[operators] object CupedFormula {
    private val nd = "CAST(n AS DOUBLE)"
    private val cov = s"((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) " +
      s"* CAST(sy AS DOUBLE) / $nd) / $nd)"
    private val vx = s"((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) " +
      s"* CAST(sx AS DOUBLE) / $nd) / $nd)"
    private val vy = s"((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) " +
      s"* CAST(sy AS DOUBLE) / $nd) / $nd)"
    private val th = s"($cov / $vx)"
    private val lraw = "(CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) " +
      "- CAST(sya AS DOUBLE) / CAST(na AS DOUBLE))"
    private val dx = "(CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) " +
      "- CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE))"
    val theta6: String = s"CASE WHEN $vx > 0 THEN round($th, 6) END"
    val liftRaw4: String = s"round($lraw, 4)"
    val liftCuped4: String =
      s"CASE WHEN $vx > 0 THEN round($lraw - $th * $dx, 4) END"
    val rho2_6: String = s"CASE WHEN $vx > 0 AND $vy > 0 THEN " +
      s"round($cov * $cov / ($vx * $vy), 6) END"
  }

  /** q314's runs-test z over (n1, n2, n_runs) — shared text, one IEEE
    * tree, every product staged in DOUBLE (2·n1·n2·(2·n1·n2) overflows
    * int64 past ~35k kept days — centuries of calendar, but the
    * convention is uniform). NULL when Var[R] degenerates (a one-sided
    * series). */
  private[operators] object RunsFormula {
    private val nd = "(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
    private val p2 = "(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
    private val ee = s"(1.0 + $p2 / $nd)"
    private val vv = s"($p2 * ($p2 - $nd) / ($nd * $nd * ($nd - 1.0)))"
    val z4: String = s"CASE WHEN $vv > 0 THEN " +
      s"round((CAST(n_runs AS DOUBLE) - $ee) / sqrt($vv), 4) END"
  }

  /** q302's lag-h autocorrelation over the exact moment sums — shared
    * text, one IEEE tree: r_h = Σ(x_t−x̄)(x_{t−h}−x̄) / Σ(x_t−x̄)²
    * expanded over (n, sx, sxx) global and (cnt, sa, sb, sxy) per-lag
    * sums, with x̄ = sx/n. NULL on a flat series (den = 0). */
  /** q372's trees: the tie-corrected Mann–Whitney z over the exact
    * per-source aggregates (u2, ns, nr, n, tie3), and the two-sided
    * normal p from the Abramowitz–Stegun 7.1.26 erfc polynomial
    * (|ε| < 1.5e-7) — pure arithmetic + exp, so the p-value replays
    * bit-for-bit on engines without an erfc builtin. The erfc input
    * is the ALREADY-4dp-ROUNDED z, so ulp noise upstream cannot
    * straddle the final 8dp rounding. */
  private[operators] object BhFormula {
    private val varU = "(CAST(ns AS DOUBLE) * CAST(nr AS DOUBLE) / 12.0 " +
      "* ((CAST(n AS DOUBLE) + 1.0) - CAST(tie3 AS DOUBLE) " +
      "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))"
    val z4: String = s"CASE WHEN $varU > 0 THEN " +
      s"round((CAST(u2 AS DOUBLE) / 2.0 - CAST(ns AS DOUBLE) " +
      s"* CAST(nr AS DOUBLE) / 2.0) / sqrt($varU), 4) END"
    private def erfcAS(x: String): String = {
      val tt = s"(1.0 / (1.0 + 0.3275911 * ($x)))"
      s"($tt * (0.254829592 + $tt * (-0.284496736 + $tt * (1.421413741 " +
        s"+ $tt * (-1.453152027 + $tt * 1.061405429)))) " +
        s"* exp(-($x) * ($x)))"
    }
    val p8: String =
      s"round(${erfcAS("abs(z4) / 1.4142135623730951")}, 8)"
  }

  private[operators] object LbFormula {
    private val xm = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    private val num = s"(CAST(sxy AS DOUBLE) - $xm * " +
      s"(CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) " +
      s"+ CAST(cnt AS DOUBLE) * $xm * $xm)"
    private val den = s"(CAST(sxx AS DOUBLE) " +
      s"- CAST(n AS DOUBLE) * $xm * $xm)"
    val r6: String = s"CASE WHEN $den != 0 THEN round($num / $den, 6) END"
  }

  /** q254's closed-form strings over the double moment names
    * (n, sq, sd, sy, sqq, sqd, sdd, sqy, sdy, syy). The SAME text runs
    * through Spark's `expr()` and the DuckDB oracle SQL, so the IEEE
    * double expression trees are identical by construction — there is
    * no hand-mirrored second copy to drift. Cofactors of the symmetric
    * normal matrix [[n,sq,sd],[sq,sqq,sqd],[sd,sqd,sdd]]; beta =
    * adj·[sy,sqy,sdy]/det; R² from the normal-equations SSE identity. */
  private[operators] object OlsFormula {
    private val c11 = "(sqq*sdd - sqd*sqd)"
    private val c12 = "(sd*sqd - sq*sdd)"
    private val c13 = "(sq*sqd - sqq*sd)"
    private val c22 = "(n*sdd - sd*sd)"
    private val c23 = "(sq*sd - n*sqd)"
    private val c33 = "(n*sqq - sq*sq)"
    val det = s"(n*$c11 + sq*$c12 + sd*$c13)"
    val b0 = s"(($c11*sy + $c12*sqy + $c13*sdy) / $det)"
    val bq = s"(($c12*sy + $c22*sqy + $c23*sdy) / $det)"
    val bd = s"(($c13*sy + $c23*sqy + $c33*sdy) / $det)"
    private val sse = s"(syy - $b0*sy - $bq*sqy - $bd*sdy)"
    private val sst = "(syy - sy*sy/n)"
    val b0Out = s"CASE WHEN $det <> 0 THEN round($b0, 6) END"
    val bqOut = s"CASE WHEN $det <> 0 THEN round($bq, 6) END"
    val bdOut = s"CASE WHEN $det <> 0 THEN round($bd, 6) END"
    val r2Out =
      s"CASE WHEN $det <> 0 AND $sst <> 0 THEN round(1.0 - $sse/$sst, 6) END"
  }

  /** q286's tau-b closing formula over the exact integer columns
    * (cmd = C−D, dx = n(n−1)−Σtx(tx−1), dy likewise) — the SAME text
    * runs through Spark `expr()` and the DuckDB oracle (OlsFormula
    * convention), so both engines evaluate one IEEE tree. The `+ 0`
    * normalizes a −0.0 round result to +0.0 identically on both
    * engines (q63/q280 precedent). */
  private[operators] object KendallFormula {
    val tau6 = "round(CAST(cmd AS DOUBLE) / sqrt((CAST(dx AS DOUBLE) / 2)" +
      " * (CAST(dy AS DOUBLE) / 2)), 6) + 0"
  }

  /** q287's Cramér's V closing formula over chi2 (the 6dp-per-cell
    * decimal-summed statistic, q162's construction) and the exact
    * integer table dimensions — shared text, one IEEE tree (OlsFormula
    * convention). V ≥ 0 so no −0.0 normalization is needed. */
  private[operators] object CramersFormula {
    val v6 = "round(sqrt(chi2 / (CAST(ntot AS DOUBLE) * " +
      "least(nr - 1, nc - 1))), 6)"
  }

  /** q328's Kruskal–Wallis H over the exact rank moments (nn = N,
    * sq = Σⱼ s2ⱼ²/nⱼ with s2ⱼ = 2·rank-sum, tie3 = Σ t³−t) — shared
    * text, one IEEE tree. With R_j = s2j/2 the classic
    * 12/(N(N+1))·ΣR²/n becomes 3·sq/(N(N+1)); the tie-corrected form
    * divides by 1 − tie3/(N³−N) and is NULL when every value ties
    * (corr = 0). */
  private[operators] object KwFormula {
    private val n = "CAST(nn AS DOUBLE)"
    private val hRaw =
      s"(3.0 * CAST(sq AS DOUBLE) / ($n * ($n + 1.0)) - 3.0 * ($n + 1.0))"
    private val corr =
      s"(1.0 - CAST(tie3 AS DOUBLE) / ($n * $n * $n - $n))"
    val h4: String = s"round($hRaw, 4)"
    val hc4: String =
      s"CASE WHEN $corr > 0 THEN round($hRaw / $corr, 4) END"
  }

  /** q331's Brown–Forsythe F over the exact deviation moments (k
    * groups, nn = N, ss = Σz, bb = Σⱼ sⱼ²/nⱼ, qq = Σz²) — shared
    * text, one IEEE tree. SSB = bb − ss²/N, SSW = qq − bb; F is NULL
    * when the within-group spread degenerates (all deviations equal)
    * or k = 1. */
  private[operators] object BfFormula {
    private val n = "CAST(nn AS DOUBLE)"
    private val kk = "CAST(k AS DOUBLE)"
    private val ssb = "(CAST(bb AS DOUBLE) - CAST(ss AS DOUBLE) " +
      s"* CAST(ss AS DOUBLE) / $n)"
    private val ssw = "(CAST(qq AS DOUBLE) - CAST(bb AS DOUBLE))"
    val f4: String = s"CASE WHEN $ssw > 0 AND $kk > 1 THEN " +
      s"round(($ssb / ($kk - 1.0)) / ($ssw / ($n - $kk)), 4) END"
  }

  /** q344's regression slope over the exact moment names (nn, sx, sy,
    * sxx, sxy) — shared text, one IEEE tree; NULL on zero variance.
    * Serves both the per-stratum and the pooled rows (the pooled row
    * is the same five sums summed once more). */
  private[operators] object SlopeFormula {
    private val n = "CAST(nn AS DOUBLE)"
    private val num = s"($n * CAST(sxy AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    private val den = s"($n * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val slope4: String = s"CASE WHEN $den > 0 THEN round($num / $den, 4) END"
  }

  /** q335's Poisson-dispersion trees over the exact daily-count
    * moments (n_days, s1 = Σc, s2 = Σc²) — shared text, one IEEE tree
    * each. disp = sample-variance/mean (1 under a Poisson process);
    * chi = Σ(x−x̄)²/x̄ = disp·(n−1), the classic dispersion statistic
    * against χ²(n−1). NULL when the log is empty or a single day. */
  private[operators] object DispFormula {
    private val n = "CAST(n_days AS DOUBLE)"
    private val s1 = "CAST(s1 AS DOUBLE)"
    private val s2 = "CAST(s2 AS DOUBLE)"
    private val ss = s"($s2 - $s1 * $s1 / $n)"
    val disp4: String = s"CASE WHEN n_days > 1 AND s1 > 0 THEN " +
      s"round(($ss / ($n - 1.0)) / ($s1 / $n), 4) END"
    val chi4: String = s"CASE WHEN n_days > 1 AND s1 > 0 THEN " +
      s"round($ss / ($s1 / $n), 4) END"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Poisson overdispersion test on the daily event arrival counts —
    // Fisher's dispersion index (public textbook): var/mean of the
    // per-day totals is 1 under a memoryless arrival process; the
    // burst-vs-Poisson readout q125 (per-user burstiness) and q154
    // (anomaly days) both implicitly assume. ONE hash agg to the
    // daily histogram and one moment row (Σc, Σc² exact,
    // decimal-staged) — map-side combinable at any log size; mean
    // [D5] integer-staged; disp/chi shared-string trees (DispFormula).
    "q335_overdispersion" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val daily = t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      daily.agg(count(lit(1)).as("n_days"), sum(col("c")).as("s1"),
          sum(d38(col("c")) * col("c")).as("s2"))
        .select(col("n_days"), col("s1").as("n_events"),
          (expr("(2 * s1 * 10000 + n_days) div (2 * n_days)")
            .cast("double") / 10000.0).as("mean4"),
          expr(DispFormula.disp4).as("disp4"),
          expr(DispFormula.chi4).as("chi4"))
    }),

    // Cramér's V — the [0,1]-normalized effect size over the q162 chi2
    // machinery, on a second contingency domain: order priority ×
    // customer market segment (5×5). The corpus collapses to the grid
    // with one join + one hash agg; expected-count deviations are
    // integer-exact (HUGEINT/decimal cross-products), per-cell terms
    // 6dp-quantized and decimal-summed (q162 [D2]); V is the one
    // shared-string double formula over chi2, n, and the exact grid
    // dimensions. Zero-observed grid cells participate via the
    // rt×ct LEFT JOIN exactly as in q162.
    "q287_cramers_v" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val obs = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority").as("pri"),
          col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("o"))
      val rt = obs.groupBy("pri").agg(sum(col("o")).as("r"))
      val ct = obs.groupBy("seg").agg(sum(col("o")).as("c"))
      val nn = obs.agg(sum(col("o")).as("ntot"))
      val dims = rt.agg(count(lit(1)).as("nr"))
        .crossJoin(broadcast(ct.agg(count(lit(1)).as("nc"))))
      val cells = rt.crossJoin(broadcast(ct)).crossJoin(broadcast(nn))
        .join(obs, Seq("pri", "seg"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
      val dev = d38(col("o")) * col("ntot") - d38(col("r")) * col("c")
      val den = d38(col("ntot")) * col("r") * col("c")
      cells
        .select(col("ntot"),
          round(dev.cast("double") * dev.cast("double")
            / den.cast("double"), 6).as("tt"))
        .agg(count(lit(1)).as("n_cells"), max(col("ntot")).as("ntot"),
          sum(col("tt").cast(Dec)).cast("double").as("chi2"))
        .crossJoin(broadcast(dims))
        .select(col("n_cells"), col("chi2"),
          expr(CramersFormula.v6).as("v6"))
    }),

    // Bootstrap confidence interval for the mean daily revenue —
    // uncertainty quantification by SEEDED resampling: 200 bootstrap
    // replicates, each drawing n_days day-indices via the portable
    // polyMix hash of (replicate·N + draw) — a pure function of the
    // data, replayed bit-exactly by the oracle (the q226/q228 sampled-
    // operator convention, so "random" resampling is still hash-
    // gated). Draws are generated by a days×replicates cross (the
    // calendar-bounded daily table broadcast against a 200-row
    // literal), resolved by ONE equi-join on the drawn index; per-
    // replicate totals are exact integer cents, and the 2.5%/97.5%
    // bounds are PICKED by rank from the 200-total histogram (rank 5 /
    // rank 196 of 200) via the distributed cumSum — no float
    // percentile formula, no sort. Day indices come from the
    // partition-offset GlobalRank (no single-task window).
    "q297_bootstrap_ci" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val (pool, n) = graft.functions.GlobalRank.rowNumberWithTotal(
        daily.select(col("day"), col("cents")), Seq(col("day").asc))
      val days = pool.select((col("rn") - 1).as("r"), col("cents"))
      val reps = daily.limit(1).select(
        explode(sequence(lit(0L), lit(BootB - 1))).as("b"))
      val hm = GraphQueries.HashM
      val draws = days.select(col("r")).crossJoin(broadcast(reps))
        .select(col("b"),
          pmod(GraphQueries.polyMix(
            pmod(col("b") * n + col("r"), lit(hm))), lit(n)).as("idx"))
      val tot = draws.join(days.select(col("r").as("idx"),
          col("cents")), Seq("idx"))
        .groupBy("b").agg(sum(col("cents")).as("t"))
      val hist = tot.groupBy("t").agg(count(lit(1)).as("cnt"))
        .withColumn("g", lit(1))
      val orig = daily.agg(sum(col("cents")).as("t0"))
      val mean6 = (c: org.apache.spark.sql.Column) =>
        round(c.cast("double") / lit(n).cast("double") / 100, 6)
      graft.functions.GlobalRank.cumSum(hist, "g", "t", "cnt")
        .agg(min(when(col("cum") >= BootLoRank, col("t"))).as("lo"),
          min(when(col("cum") >= BootHiRank, col("t"))).as("hi"))
        .crossJoin(broadcast(orig))
        .select(lit(n).as("n_days"), lit(BootB).as("n_boot"),
          mean6(col("t0")).as("mean6"), mean6(col("lo")).as("lo6"),
          mean6(col("hi")).as("hi6"))
    }),

    // CUPED-adjusted A/B readout — variance reduction with a
    // pre-period covariate (Deng et al. 2013, public method), the
    // industry-standard upgrade to q276's plain lift: per customer,
    // x = pre-1996 spend (covariate), y = 1996+ spend (metric), arms
    // by the polyMix parity of the customer key [D1]; θ = cov/var(x)
    // pooled, adjusted lift = lift_raw − θ·(x̄_b − x̄_a), and the
    // variance-reduction factor is exactly ρ². EVERY moment is one
    // exact integer/decimal sum in ONE map-side-combinable aggregate
    // row; all derived doubles are shared-string IEEE trees
    // (CupedFormula).
    "q322_ab_cuped" -> ((s, dir) => {
      val d19 = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
      val pc = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(
          sum(when(year(col("o_orderdate")) < 1996,
            round(col("o_totalprice") * 100).cast("long"))
            .otherwise(0L)).as("x"),
          sum(when(year(col("o_orderdate")) >= 1996,
            round(col("o_totalprice") * 100).cast("long"))
            .otherwise(0L)).as("y"))
        .withColumn("arm", pmod(GraphQueries.polyMix(
          pmod(col("o_custkey"), lit(GraphQueries.HashM))), lit(2L)))
      pc.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(d19(col("x")) * d19(col("x"))).as("sxx"),
          sum(d19(col("y")) * d19(col("y"))).as("syy"),
          sum(d19(col("x")) * d19(col("y"))).as("sxy"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
          sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sxa"),
          sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sxb"),
          sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sya"),
          sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("syb"))
        .select(col("na").as("n_a"), col("nb").as("n_b"),
          expr(CupedFormula.theta6).as("theta6"),
          expr(CupedFormula.liftRaw4).as("lift_raw4"),
          expr(CupedFormula.liftCuped4).as("lift_cuped4"),
          expr(CupedFormula.rho2_6).as("rho2_6"))
    }),

    // Cochran–Armitage trend test — does the fulfilled rate TREND
    // across the ordered value bands (q296 fits the monotone curve;
    // this tests whether a trend exists at all)? The standard ordered-
    // proportions test: with scores w = band index, χ² = T²/V where
    // T = Σw·s − p̄·Σw·n and V = p̄(1−p̄)(Σw²n − (Σwn)²/N). One hash
    // agg to the fixed 10-bin domain, one moment agg (w ≤ 9 keeps
    // every integer moment exact at any corpus size), one shared-
    // string IEEE tree — the squared sum stages through DOUBLE
    // ((Σwn)² overflows int64 past ~1e9 orders).
    "q312_cochran_armitage" -> ((s, dir) => {
      val bins = t(s, dir, "orders").select(
        expr("least(cast(round(o_totalprice * 100) as bigint)" +
          " div 5000000, 9L)").as("w"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        .groupBy("w")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      bins.agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"),
          sum(col("w") * col("n")).as("sw1"),
          sum(col("w") * col("w") * col("n")).as("sw2"),
          sum(col("w") * col("s")).as("sws"))
        .select(col("nn").as("n_orders"), col("ss").as("n_fulfilled"),
          expr(CaFormula.chi4).as("ca_chi4"))
    }),

    // Wald–Wolfowitz runs test — is the daily revenue series's
    // above/below-median pattern random, or does it streak? (q302
    // tests linear autocorrelation; runs catch nonlinear clustering.)
    // The median is PICKED by rank from the value histogram via the
    // distributed cumSum (q44 machinery, no global sort); days equal
    // to the median drop (the standard treatment of ties); runs count
    // as 1 + the rank-adjacent sign changes from ONE spine equi-join;
    // E[R]/Var[R] are the closed forms over (n1, n2) through a
    // shared-string IEEE tree with products staged in DOUBLE.
    "q314_runs_test" -> ((s, dir) => {
      // the ~day-count daily table feeds four consumers (histogram,
      // tie filter, spine, counts) — checkpoint it once instead of
      // re-collapsing the order scan per consumer
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
        .localCheckpoint(true)
      val hist = daily.groupBy("cents").agg(count(lit(1)).as("cnt"))
        .withColumn("g", lit(1))
      val med = graft.functions.GlobalRank.cumSum(hist, "g", "cents", "cnt")
        .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("cents")))
          .as("med"))
      val kept = daily.crossJoin(broadcast(med))
        .filter(col("cents") =!= col("med"))
        .select(col("day"), (col("cents") > col("med")).cast("long")
          .as("f"))
      val (pool, _) = graft.functions.GlobalRank.rowNumberWithTotal(
        kept, Seq(col("day").asc))
      val a = pool.select(col("rn"), col("f"))
      val b = pool.select((col("rn") + 1).as("rn"), col("f").as("pf"))
      val tr = a.join(b, Seq("rn"))
        .agg(sum(when(col("f") =!= col("pf"), 1L).otherwise(0L)).as("tr"))
      pool.agg(sum(col("f")).as("n1"),
          sum(lit(1L) - col("f")).as("n2"))
        .crossJoin(broadcast(tr))
        .select(col("n1"), col("n2"), (col("tr") + 1L).as("n_runs"))
        .select(col("n1"), col("n2"), col("n_runs"),
          expr(RunsFormula.z4).as("z4"))
    }),

    // Ljung–Box portmanteau test — is the daily revenue series white
    // noise, jointly over its first 7 autocorrelations? (q152 measures
    // ONE lag of the event series; a forecast residual check needs the
    // joint statistic.) Days are indexed by the partition-offset
    // GlobalRank; each lag's cross-moments come from ONE equi-join of
    // the series against its 7-row lag-literal shift (constant fan-out,
    // documented BNLJ); r_h is the standard full-series-variance
    // estimator via a shared-string IEEE tree over exact integer/
    // decimal moment sums; Q = n(n+2)·Σ r_h²/(n−h) with per-lag terms
    // 8dp-quantized and decimal-summed [D2], riding every lag row
    // (q201 convention).
    "q302_ljung_box" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val (pool, n) = graft.functions.GlobalRank.rowNumberWithTotal(
        daily, Seq(col("day").asc))
      val dd = pool.select(col("rn"), col("cents").as("x"))
      val d19 = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
      val glob = dd.agg(sum(col("x")).as("sx"),
        sum(d19(col("x")) * d19(col("x"))).as("sxx"))
      val lags = dd.limit(1).select(
        explode(sequence(lit(1L), lit(LbMaxLag))).as("h"))
      val shifted = dd.crossJoin(broadcast(lags))
        .select((col("rn") + col("h")).as("rn"), col("h"),
          col("x").as("y"))
      val cells = dd.join(shifted, Seq("rn"))
        .groupBy("h").agg(count(lit(1)).as("cnt"),
          sum(col("x")).as("sa"), sum(col("y")).as("sb"),
          sum(d19(col("x")) * d19(col("y"))).as("sxy"))
        .crossJoin(broadcast(glob)).withColumn("n", lit(n))
        .withColumn("r6", expr(LbFormula.r6))
        .withColumn("term", round(col("r6") * col("r6")
          / col("cnt").cast("double"), 8).cast("decimal(38,8)"))
      cells.crossJoin(broadcast(cells.agg(
          round((lit(n) * lit(n + 2)).cast("double")
            * sum(col("term")).cast("double"), 4).as("lb4"))))
        .select(col("h").as("lag"), col("cnt").as("n_pairs"),
          col("r6"), col("lb4"))
        .orderBy("lag")
    }),

    // Sign-flip permutation test — is weekend daily revenue different
    // from weekday, beyond chance? The PAIRED randomization test whose
    // permutation group IS sign flips: per ISO week w (both sides
    // present), d_w = S_we·c_wd − S_wd·c_we (the integer-exact scaled
    // mean contrast c_we·c_wd·(mean_we − mean_wd)); under H0 the d_w
    // are sign-symmetric, so T_b = Σ s_w(b)·d_w over 200 SEEDED flip
    // vectors (the polyMix parity bit of (b·W + w) — a pure function
    // of the data, the q226/q297 convention, so the p-value is a
    // hash-gated row). p = (1 + #{|T_b| ≥ |T0|}) / (B+1): exact
    // integer counts until one final rounded division. The flips are a
    // weeks×200 broadcast-literal cross (documented BNLJ, replicate-
    // bounded) collapsed by one keyed agg — no window anywhere.
    "q300_permutation_test" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val we = weekday(col("day")) >= 5 // Mon=0 .. Sun=6: Sat/Sun
      val wk = daily
        .groupBy(date_trunc("week", col("day")).as("w"))
        .agg(sum(when(we, col("cents")).otherwise(0L)).as("swe"),
          sum(when(!we, col("cents")).otherwise(0L)).as("swd"),
          sum(when(we, 1L).otherwise(0L)).as("cwe"),
          sum(when(!we, 1L).otherwise(0L)).as("cwd"))
        .filter(col("cwe") > 0 && col("cwd") > 0)
        .select(col("w"),
          (col("swe") * col("cwd") - col("swd") * col("cwe")).as("d"))
      val (pool, nw) = graft.functions.GlobalRank.rowNumberWithTotal(
        wk, Seq(col("w").asc))
      val dd = pool.select((col("rn") - 1).as("r"), col("d"))
      val t0 = dd.agg(sum(col("d")).as("t0"))
      val reps = dd.limit(1).select(
        explode(sequence(lit(0L), lit(PermB - 1))).as("b"))
      val hm = GraphQueries.HashM
      val tb = dd.crossJoin(broadcast(reps))
        .select(col("b"), ((lit(1L) - lit(2L) * pmod(GraphQueries.polyMix(
          pmod(col("b") * nw + col("r"), lit(hm))), lit(2L)))
          * col("d")).as("sd"))
        .groupBy("b").agg(sum(col("sd")).as("tb"))
      tb.crossJoin(broadcast(t0))
        .agg(sum(when(abs(col("tb")) >= abs(col("t0")), 1L)
          .otherwise(0L)).as("n_ge"))
        .crossJoin(broadcast(t0))
        .select(lit(nw).as("n_weeks"), col("t0"),
          lit(PermB).as("n_perm"), col("n_ge"),
          round((col("n_ge") + 1).cast("double")
            / lit(PermB + 1).cast("double"), 6).as("p6"))
    }),

    // Isotonic regression — the monotone calibration curve of
    // fulfilled-rate vs order-value band (q175's fixed $50k bins,
    // top-coded at 9): the shape-constrained fit a score calibrator
    // applies when the response must not decrease in the score. NOT
    // iterative PAV: the fit is computed by the exact MINIMAX identity
    // iso_i = min_{j≥i} max_{k≤i} (S_j − S_{k−1})/(N_j − N_{k−1})
    // over prefix sums of the bin histogram — pure bounded joins/aggs
    // over the FIXED 10-bin domain (the corpus collapses to the bins
    // in one hash agg; everything after is ≤10³ rows at any scale).
    // Ratios are IEEE divisions of exact int64 sums, identical on both
    // engines, so min/max over them are deterministic [D2].
    "q296_isotonic" -> ((s, dir) => {
      val bins = t(s, dir, "orders").select(
        expr("least(cast(round(o_totalprice * 100) as bigint)" +
          " div 5000000, 9L)").as("bin"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      // prefix sums via the bounded self-join (≤ bins² rows) — no
      // window needed on a 10-row relation
      val cum = bins.select(col("bin").as("cb"), col("n").as("cn"),
        col("s").as("cs"))
      val pre = bins.join(broadcast(cum), col("cb") <= col("bin"))
        .groupBy("bin").agg(sum(col("cn")).as("nn"), sum(col("cs")).as("ss"))
      // candidate pooled rates over (k, j) prefix windows: rate_kj =
      // (S_j − S_{k−1}) / (N_j − N_{k−1}); pk carries the k−1 prefix
      val pk = bins.select(col("bin").as("k"))
        .join(broadcast(pre.select(col("bin").as("pb"),
          col("nn").as("pn"), col("ss").as("ps"))),
          col("pb") === col("k") - 1, "left")
        .select(col("k"), coalesce(col("pn"), lit(0L)).as("pn"),
          coalesce(col("ps"), lit(0L)).as("ps"))
      val pj = pre.select(col("bin").as("j"), col("nn").as("jn"),
        col("ss").as("js"))
      val rate = pk.join(broadcast(pj), col("j") >= col("k"))
        .select(col("k"), col("j"),
          ((col("js") - col("ps")).cast("double")
            / (col("jn") - col("pn")).cast("double")).as("r"))
      // minimax: per (i, j ≥ i) the max over k ≤ i, then min over j
      val g1 = bins.select(col("bin").as("i"))
        .join(broadcast(rate), col("k") <= col("i") && col("j") >= col("i"))
        .groupBy("i", "j").agg(max(col("r")).as("mx"))
      g1.groupBy("i").agg(min(col("mx")).as("iso"))
        .join(bins, col("i") === col("bin"))
        .select(col("bin"), col("n"), col("s"),
          round(col("s").cast("double") / col("n").cast("double"), 6)
            .as("rate6"),
          round(col("iso"), 6).as("iso6"))
        .orderBy("bin")
    }),

    // Kendall rank correlation (tau-b) between quantity and discount —
    // computed from the VALUE-GRID contingency table (50×11 cells),
    // never from row pairs: one hash agg collapses the corpus to the
    // grid, C−D is one bounded half-grid cell-pair pass (broadcast-
    // tiny BNLJ on x2 > x1; the sign of Δy folds concordant and
    // discordant into a single sum), and the tie corrections come from
    // the 1D value histograms. Every count is exact (decimal(38,0)
    // staging — n(n−1) alone overflows int64 past ~3e9 rows); tau is
    // the one shared-string double formula [D2][D3].
    "q286_kendall_tau" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val v = t(s, dir, "lineitem").select(
        col("l_quantity").cast("long").as("x"),
        round(col("l_discount") * 100).cast("long").as("y"))
      val cells = v.groupBy("x", "y").agg(count(lit(1)).as("c"))
      val a = cells.select(col("x").as("x1"), col("y").as("y1"),
        col("c").as("c1"))
      val b = cells.select(col("x").as("x2"), col("y").as("y2"),
        col("c").as("c2"))
      val cmd = a.join(broadcast(b), col("x2") > col("x1"))
        .select((d38(col("c1")) * col("c2") *
          when(col("y2") > col("y1"), 1).when(col("y2") < col("y1"), -1)
            .otherwise(0)).as("p"))
        .agg(sum(col("p")).as("cmd"))
      val tx = cells.groupBy("x").agg(sum(col("c")).as("t"))
        .agg(sum(d38(col("t")) * (col("t") - 1)).as("t2x"))
      val ty = cells.groupBy("y").agg(sum(col("c")).as("t"))
        .agg(sum(d38(col("t")) * (col("t") - 1)).as("t2y"))
      val nn = v.agg(count(lit(1)).as("n"))
      cmd.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
        .crossJoin(broadcast(nn))
        .withColumn("dx", d38(col("n")) * (col("n") - 1) - col("t2x"))
        .withColumn("dy", d38(col("n")) * (col("n") - 1) - col("t2y"))
        .select(col("n").as("n_rows"),
          col("cmd").cast("long").as("c_minus_d"),
          expr(KendallFormula.tau6).as("tau6"))
    }),

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

    // The ORACLE-GATED estimation sibling of q45 (round 10 — the
    // q226/q228/q239 portable-sampling pattern applied to quantiles):
    // the same (l_returnflag × p25/p50/p75) surface, estimated as the
    // EXACT percentile_disc of a deterministic 1-in-16 polyMix row
    // sample instead of a GK sketch. The sample predicate is a pure
    // function of the row key, so the estimate is bit-identical on any
    // layout AND in the DuckDB replay — unlike q45's sketch, whose
    // merge order is engine-internal. Quantiles over the sample run on
    // the distributed value histogram + range-partitioned cumulative
    // sum (the q44/q46 machinery — no per-group sort); at 100 TB the
    // sample keeps the histogram build 16× cheaper and the error
    // ~1/√(n/16) (StatsSpec pins the observed band vs exact).
    "q240_sampled_quantiles" -> ((s, dir) => {
      val samp = t(s, dir, "lineitem")
        .filter(pmod(GraphQueries.pairMix(col("l_orderkey"),
          col("l_linenumber")), lit(16L)) === 0)
      val hist = samp.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
      graft.functions.GlobalRank
        .cumSum(hist, "l_returnflag", "l_extendedprice", "cnt")
        .groupBy("l_returnflag")
        .agg(max(col("n")).as("n_sample"),
          min(when(col("cum") * 4 >= col("n"), col("l_extendedprice")))
            .as("p25"),
          min(when(col("cum") * 2 >= col("n"), col("l_extendedprice")))
            .as("p50"),
          min(when(col("cum") * 4 >= col("n") * 3, col("l_extendedprice")))
            .as("p75"))
        .orderBy("l_returnflag")
    }),

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
    }),

    // Chi-square independence screen: event_type × (props.k mod 8)
    // contingency table. Everything before the last step is exact
    // integer arithmetic — cell counts, margins and N are BIGINTs and
    // (o·N − r·c)² / (N·r·c) is formed from exact decimal products cast
    // to double only for the final ratio, per-cell ROUNDed to 6dp, then
    // decimal-summed (order-independent) into the statistic. Empty
    // cells of the full margin cross (o = 0) are included, as the
    // statistic requires. The margins and N are one-row/tiny broadcast
    // aggregates; the only data-sized pass is the first partial agg.
    "q162_chi2" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val obs = t(s, dir, "events")
        .select(col("event_type"),
          (get_json_object(col("props"), "$.k").cast("long") % 8).as("kb"))
        .groupBy("event_type", "kb").agg(count(lit(1)).as("o"))
      val rt = obs.groupBy("event_type").agg(sum(col("o")).as("r"))
      val ct = obs.groupBy("kb").agg(sum(col("o")).as("c"))
      val nn = obs.agg(sum(col("o")).as("ntot"))
      val cells = rt.crossJoin(ct).crossJoin(broadcast(nn))
        .join(obs, Seq("event_type", "kb"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
      val dev = d38(col("o")) * col("ntot") - d38(col("r")) * col("c")
      val den = d38(col("ntot")) * col("r") * col("c")
      cells
        .select(round(dev.cast("double") * dev.cast("double")
          / den.cast("double"), 6).as("tt"))
        .agg(count(lit(1)).as("n_cells"),
          sum(col("tt").cast(Dec)).cast("double").as("chi2"))
    }),

    // Tukey-fence outlier screen: per-segment lifetime spend per
    // customer, outliers past [q1 − 1.5·IQR, q3 + 1.5·IQR]. Quartiles
    // come from the q44 value-histogram + distributed-cumulative
    // machinery (no per-group sort); the fences are exact integer-cent
    // arithmetic (1.5·IQR as 3·IQR div 2 — no double boundary), and
    // the 5-row fence table broadcasts back over the spend relation.
    "q169_iqr_outliers" -> ((s, dir) => {
      val spend = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      val hist = spend.groupBy("seg", "c").agg(count(lit(1)).as("cnt"))
      val fences = graft.functions.GlobalRank
        .cumSum(hist, "seg", "c", "cnt")
        .groupBy("seg")
        .agg(
          min(when(col("cum") >= expr("(n + 3) div 4"), col("c")))
            .as("q1_cents"),
          min(when(col("cum") >= expr("(3 * n + 3) div 4"), col("c")))
            .as("q3_cents"))
        .withColumn("lo",
          expr("q1_cents - 3 * (q3_cents - q1_cents) div 2"))
        .withColumn("hi",
          expr("q3_cents + 3 * (q3_cents - q1_cents) div 2"))
      spend.join(broadcast(fences), Seq("seg"))
        .groupBy("seg")
        .agg(max(col("q1_cents")).as("q1_cents"),
          max(col("q3_cents")).as("q3_cents"),
          sum(when(col("c") < col("lo") || col("c") > col("hi"), 1L)
            .otherwise(0L)).as("n_outliers"),
          count(lit(1)).as("n_cust"))
        .orderBy("seg")
    }),

    // Spearman rank correlation (price vs quantity per return flag),
    // average-rank tie handling. Ranks come from per-group value
    // histograms + the distributed cumulative — no global sort — and
    // every moment is EXACT: avg ranks are half-integers, so the
    // moments accumulate 2·rank integers (Σ2x, Σ2x·2y, ...) in
    // DECIMAL(38,0), and rho is one fixed double formula on the exact
    // integer differences n·Σ4xy − Σ2x·Σ2y (the ÷4s cancel). The
    // oracle replays the identical integer moments in HUGEINT — no
    // order-dependent double summation on either engine [D2].
    "q170_spearman" -> ((s, dir) => {
      val v = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("x"),
        col("l_quantity").cast("long").as("y"))
      def rank2(valCol: String): DataFrame = {
        val hist = v.groupBy("g", valCol).agg(count(lit(1)).as("cnt"))
        graft.functions.GlobalRank.cumSum(hist, "g", valCol, "cnt")
          .select(col("g"), col(valCol),
            (lit(2) * (col("cum") - col("cnt")) + col("cnt") + 1)
              .as(s"r2$valCol"))
      }
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val m = v
        .join(rank2("x"), Seq("g", "x"))
        .join(rank2("y"), Seq("g", "y"))
        .groupBy("g")
        .agg(count(lit(1)).as("n"),
          sum(d38(col("r2x"))).as("s2x"),
          sum(d38(col("r2y"))).as("s2y"),
          sum(d38(col("r2x")) * col("r2y")).as("s4xy"),
          sum(d38(col("r2x")) * col("r2x")).as("s4xx"),
          sum(d38(col("r2y")) * col("r2y")).as("s4yy"))
      m.select(col("g").as("l_returnflag"), col("n"),
          round((d38(col("n")) * col("s4xy") - col("s2x") * col("s2y"))
            .cast("double")
            / (sqrt((d38(col("n")) * col("s4xx") - col("s2x") * col("s2x"))
                .cast("double"))
              * sqrt((d38(col("n")) * col("s4yy") - col("s2y") * col("s2y"))
                .cast("double"))), 6).as("rho6"))
        .orderBy("l_returnflag")
    }),

    // Two-sample Kolmogorov–Smirnov distance between the returned
    // (l_returnflag = 'R') and kept price distributions: D =
    // max over values of |F_R − F_other|. Both empirical CDFs come
    // from ONE value histogram carrying both group counts, cumulated
    // twice with the distributed cumSum (same exchange shape), joined
    // on the value — the counts are exact longs, each CDF ratio a
    // single double division, so D is bit-identical to the oracle's
    // window replay [D2].
    "q173_ks_test" -> ((s, dir) => {
      val v = t(s, dir, "lineitem").select(
        round(col("l_extendedprice") * 100).cast("long").as("c"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("grp"))
      val hist = v.groupBy("c").agg(
        sum(col("grp")).as("a1"),
        sum(lit(1L) - col("grp")).as("a0"))
        .withColumn("g", lit(1))
      val c1 = graft.functions.GlobalRank.cumSum(hist, "g", "c", "a1")
        .select(col("c"), col("cum").as("c1"), col("n").as("n1"))
      val c0 = graft.functions.GlobalRank.cumSum(hist, "g", "c", "a0")
        .select(col("c"), col("cum").as("c0"), col("n").as("n0"))
      c1.join(c0, Seq("c"))
        .select(abs(col("c1").cast("double") / col("n1")
          - col("c0").cast("double") / col("n0")).as("dd"))
        .agg(count(lit(1)).as("n_values"),
          round(max(col("dd")), 6).as("ks6"))
    }),

    // Population stability index of the order-value distribution,
    // pre-1998 vs 1998+ cohorts over fixed $50k bins (top-coded at 9):
    // PSI = Σ (p_a − p_b)·ln(p_a/p_b) over bins present in both. One
    // hash agg to the 10-bin histogram; contributions are 8dp-quantized
    // then decimal-summed, the house convention that absorbs sub-quantum
    // libm ln() drift (q48/q112 precedent) [D2][D3].
    "q175_psi" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        when(year(col("o_orderdate")) < 1998, 0).otherwise(1).as("per"),
        expr("least(cast(round(o_totalprice * 100) as bigint) div 5000000," +
          " 9L)").as("bin"))
      val h = o.groupBy("bin").agg(
        sum(when(col("per") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("per") === 1, 1L).otherwise(0L)).as("b"))
      val n = h.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
      val pa = col("a").cast("double") / col("na")
      val pb = col("b").cast("double") / col("nb")
      h.crossJoin(broadcast(n))
        .filter(col("a") > 0 && col("b") > 0)
        .select(round((pa - pb) * log(pa / pb), 8).as("contrib"))
        .agg(count(lit(1)).as("n_bins"),
          sum(col("contrib").cast("decimal(38,8)")).cast("double").as("psi"))
    }),

    // Welch's unequal-variance t-test: returned vs kept discount
    // distributions. Moments are exact DECIMAL sums (discount ≤ 2dp →
    // x² ≤ 4dp exact); t and the Welch–Satterthwaite df are one fixed
    // double formula over the two one-row moment sets — bit-identical
    // at any partition count and in the oracle [D2].
    "q185_welch_t" -> ((s, dir) => {
      val v = t(s, dir, "lineitem").select(
        when(col("l_returnflag") === "R", 1).otherwise(0).as("g"),
        col("l_discount").cast(Dec).as("x"))
      val m = v.groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
      val piv = m.agg(
        max(when(col("g") === 1, col("n"))).as("n1"),
        max(when(col("g") === 0, col("n"))).as("n0"),
        max(when(col("g") === 1, col("sx").cast("double"))).as("sx1"),
        max(when(col("g") === 0, col("sx").cast("double"))).as("sx0"),
        max(when(col("g") === 1, col("sxx").cast("double"))).as("sxx1"),
        max(when(col("g") === 0, col("sxx").cast("double"))).as("sxx0"))
      val a = ((col("sxx1") - col("sx1") * col("sx1") / col("n1"))
        / (col("n1") - 1) / col("n1"))
      val b = ((col("sxx0") - col("sx0") * col("sx0") / col("n0"))
        / (col("n0") - 1) / col("n0"))
      piv.select(col("n1"), col("n0"),
        round((col("sx1") / col("n1") - col("sx0") / col("n0"))
          / sqrt(a + b), 4).as("t4"),
        round((a + b) * (a + b)
          / (a * a / (col("n1") - 1) + b * b / (col("n0") - 1)), 2)
          .as("df2"))
    }),

    // A/B experiment readout — the product-analytics endpoint that
    // closes the loop on deterministic hash assignment: users split
    // into two arms by polyMix (the portable randomization unit — the
    // SAME user lands in the SAME arm on any engine or cluster), the
    // metric is per-user purchase revenue, and the report carries the
    // three numbers an experimenter reads first: lift, the Welch
    // t-statistic, and the sample-ratio-mismatch chi-square (the
    // assignment-health check that catches a broken bucketing hash
    // before anyone trusts the lift). Per-user revenue is a decimal
    // sum ([D2]); the arm moments ride ONE map-side-combinable
    // aggregate; every derived double comes from AbFormula strings
    // shared verbatim with the oracle ([D3] — no hand-mirrored copy).
    "q276_ab_lift" -> ((s, dir) =>
      abMoments(s, dir).select(
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        expr(AbFormula("mean_a4")).as("mean_a4"),
        expr(AbFormula("mean_b4")).as("mean_b4"),
        expr(AbFormula("lift4")).as("lift4"),
        expr(AbFormula("t4")).as("t4"),
        expr(AbFormula("srm_chi4")).as("srm_chi4"))),

    // Standardized effect sizes for the same A/B readout — the
    // magnitude companion of q276's significance (a big experiment
    // makes a trivial lift "significant"; d says whether it MATTERS):
    // Cohen's d on the pooled sd, Hedges' g small-sample correction,
    // and the log variance ratio ln(s_b/s_a) (all public textbook).
    // Reads the SAME memo-shaped moment row as q276 (abMoments — one
    // definition, two keys) and derives everything in shared-string
    // IEEE trees (EffectFormula), NULL-guarded on degenerate arms.
    "q343_effect_size" -> ((s, dir) =>
      abMoments(s, dir).select(
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        expr(EffectFormula.d4).as("d4"),
        expr(EffectFormula.g4).as("g4"),
        expr(EffectFormula.lnvr4).as("lnvr4"))),

    // Minimum detectable effect at the experiment's CURRENT size —
    // the power-analysis readout (two-sided α = 0.05, power 0.8;
    // public textbook closed form MDE = (z_{α/2} + z_β)·SE) that
    // tells an experiment owner whether q276's "not significant" is
    // evidence of no effect or just an underpowered readout. Same
    // shared moment row (abMoments — third consumer); z constants
    // pre-summed to one shortest-roundtrip double literal (the q336
    // decimal-literal lesson); SE/MDE shared-string IEEE trees
    // (PowerFormula), NULL-guarded on degenerate arms.
    "q351_mde_power" -> ((s, dir) =>
      abMoments(s, dir).select(
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        expr(PowerFormula.se4).as("se4"),
        expr(PowerFormula.mde4).as("mde4"),
        expr(PowerFormula.mdeRel4).as("mde_rel4"))),

    // Mann–Whitney U (rank-sum) test on quantities, returned vs kept,
    // with the exact tie-corrected normal approximation. Reuses q170's
    // integer 2·rank trick over the combined value histogram: 2·U and
    // Σ(t³−t) are EXACT integers (decimal sums), so both engines form
    // z from the same numbers [D2].
    "q186_mannwhitney" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val v = t(s, dir, "lineitem").select(
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("g"),
        col("l_quantity").cast("long").as("x"))
      val h = v.groupBy("x").agg(sum(col("g")).as("c1"),
          sum(lit(1L) - col("g")).as("c0"))
        .withColumn("t", col("c1") + col("c0"))
        .withColumn("gg", lit(1))
      val r = graft.functions.GlobalRank.cumSum(h, "gg", "x", "t")
        .withColumn("r2", lit(2) * (col("cum") - col("t")) + col("t") + 1)
      val agg = r.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"),
        sum(d38(col("c1")) * col("r2")).as("s2"),
        sum(d38(col("t")) * col("t") * col("t") - col("t")).as("tie3"))
      val u2 = (col("s2") - d38(col("n1")) * (col("n1") + 1))
      val nn = col("n1") + col("n0")
      val varU = col("n1").cast("double") * col("n0") / 12.0 *
        ((nn + 1).cast("double") - col("tie3").cast("double")
          / (nn.cast("double") * (nn - 1).cast("double")))
      agg.select(col("n1"), col("n0"),
        u2.cast("long").as("u2x"),
        round((u2.cast("double") / 2.0
          - col("n1").cast("double") * col("n0") / 2.0)
          / sqrt(varU), 4).as("z4"))
    }),

    // 1-Wasserstein (earth-mover) distance between the focus source's
    // and the rest's document-length distributions (public optimal-
    // transport textbook; 1-D closed form = ∫|F_A − F_B| dv) — the
    // MAGNITUDE companion of q173's KS max-gap and q372's rank test:
    // KS says the curves differ somewhere, W₁ says how many
    // characters of mass must MOVE to reconcile them. Merged value
    // histogram + one cumulative per side (the q365 two-cumSum
    // shape); each inter-value segment contributes
    // |cumA·nB − cumB·nA|·gap exactly (decimal-staged integers), ONE
    // division at the end [D2]. The segment gap needs lead(v) — a
    // window over the BOUNDED value-domain histogram (documented
    // q186 class).
    "q380_wasserstein" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val docs = t(s, dir, "documents")
        .select((col("source") === WassFocus).as("isf"),
          col("n_chars").cast("long").as("x"))
      val h = docs.groupBy("x")
        .agg(sum(when(col("isf"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("isf"), 1L).otherwise(0L)).as("cb"))
        .withColumn("gg", lit(1))
      val cA = graft.functions.GlobalRank.cumSum(h, "gg", "x", "ca")
        .select(col("x"), col("cum").as("cuma"), col("n").as("na"))
      val cB = graft.functions.GlobalRank.cumSum(h, "gg", "x", "cb")
        .select(col("x"), col("cum").as("cumb"), col("n").as("nb"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("x")
      val seg = cA.join(cB, Seq("x"))
        .withColumn("gap", lead(col("x"), 1).over(w) - col("x"))
        .filter(col("gap").isNotNull)
        .withColumn("t", abs(d38(col("cuma")) * col("nb")
          - d38(col("cumb")) * col("na")) * col("gap"))
      seg.groupBy("na", "nb")
        .agg(sum(col("t")).as("st"))
        .select(col("na").as("n_focus"), col("nb").as("n_rest"),
          round(col("st").cast("double")
            / (col("na").cast("double") * col("nb").cast("double")), 6)
            .as("w1_chars6"))
    }),

    // Friedman rank test (1937, public textbook) — the BLOCKED
    // companion of q328's Kruskal–Wallis: does mean document length
    // differ across langs once per-SOURCE level differences are
    // blocked out? Blocks = sources carrying all five langs (the
    // complete-block contract, filtered explicitly), treatment value =
    // the [D5] milli-char mean per cell. Within-block midranks come
    // from the exact 2·midrank integers (2·nLess + nTies + 1) via a
    // bounded ×k self-join per block (k = 5 langs — dimension-sized,
    // never data-sized); χ²_F = 3·Σ(2R_j)²/(b·k·(k+1)) − 3·b·(k+1)
    // stays integer-exact until one shared double tree, and the
    // χ²(k−1 = 4) survival has the closed form e^(−x/2)·(1 + x/2).
    "q394_friedman" -> ((s, dir) => {
      val cells = t(s, dir, "documents")
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sc"))
        .withColumn("mc", expr("(sc * 1000) div cnt"))
      val complete = cells.groupBy("source")
        .agg(count(lit(1)).as("nl")).filter(col("nl") === 5)
        .select("source")
      val cc = cells.join(complete, Seq("source"))
        .select(col("source"), col("lang"), col("mc"))
      val other = cc.select(col("source"), col("lang").as("l2"),
        col("mc").as("mc2"))
      val r2 = cc.join(other, Seq("source"))
        .groupBy("source", "lang")
        .agg((sum(when(col("mc2") < col("mc"), 2L).otherwise(0L))
          + sum(when(col("mc2") === col("mc"), 1L).otherwise(0L)) + 1)
          .as("r2"))
      val perLang = r2.groupBy("lang").agg(sum(col("r2")).as("sr2"))
      val b = complete.agg(count(lit(1)).as("b"))
      perLang.agg(count(lit(1)).as("k"),
          sum(col("sr2") * col("sr2")).as("ssr2"))
        .crossJoin(broadcast(b))
        .select(col("b"), col("k"),
          expr(FriedmanFormula.chi24).as("chi2_4"),
          expr(FriedmanFormula.p6).as("p6"))
    }),

    // Correlation ratio η² + ω² of market segment on order value
    // (Fisher's ANOVA decomposition, public textbook) — the
    // MULTI-GROUP effect size next to q357's weekday F (significance)
    // and q343's two-arm d: how much of the order-value variance does
    // the segment dimension actually EXPLAIN. SS terms derive from
    // per-segment exact decimal sums (n_g, Σx, Σx²) in integer cents;
    // the one order-sensitive piece — Σ_g s1_g²/n_g — quantizes each
    // group's term to 6dp then decimal-sums [D2], so the result is
    // partition-invariant. Scale: one fact-side agg to the 5-segment
    // grid, everything after is dimension-sized.
    "q391_eta_squared" -> ((s, dir) => {
      val d19 = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
      val v = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          round(col("o_totalprice") * 100).cast("long").as("x"))
      val per = v.groupBy("seg")
        .agg(count(lit(1)).as("ng"), sum(col("x")).as("s1g"),
          sum(d19(col("x")) * d19(col("x"))).as("s2g"))
        .withColumn("term", round(col("s1g").cast("double")
          * col("s1g").cast("double") / col("ng"), 6)
          .cast("decimal(38,6)"))
      per.agg(count(lit(1)).as("k"), sum(col("ng")).as("nn"),
          sum(col("s1g")).as("s1"), sum(col("s2g")).as("s2"),
          sum(col("term")).as("sb"))
        .select(col("k"), col("nn").as("n_orders"),
          expr(EtaFormula.eta26).as("eta2_6"),
          expr(EtaFormula.omega26).as("omega2_6"))
    }),

    // Jarque–Bera normality test per order priority (Jarque & Bera
    // 1980, public textbook) — the distribution-shape gate next to
    // q43's raw moments and q336's extreme-value fit: is totalprice
    // within a priority band even roughly normal, read as skewness,
    // excess kurtosis, JB and its closed-form χ²(2) p. Values stage
    // as integer DOLLARS (scale cancels in standardized moments);
    // Σx..Σx⁴ are EXACT decimal sums (per-row products staged through
    // DECIMAL(18,0) pairs so both engines type them identically),
    // collapsed by ONE map-side-combinable aggregate; every double
    // derives from the shared JbFormula trees [D3]. Scale: one
    // hash agg over the fact table, no shuffle beyond the 5-row
    // priority dimension.
    "q384_jarque_bera" -> ((s, dir) => {
      val d19 = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
      // integer dollars via the exact-cents stage then truncating div
      // (round(x) on a raw double can split across engines at the .5
      // representation edge; round(x·100) on 2dp prices cannot)
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority").as("priority"),
          expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) div 100")
            .as("d"))
        .withColumn("d2", col("d") * col("d"))
      o.groupBy("priority")
        .agg(count(lit(1)).as("nn"),
          sum(col("d")).as("s1"),
          sum(d19(col("d2"))).as("s2"),
          sum(d19(col("d2")) * d19(col("d"))).as("s3"),
          sum(d19(col("d2")) * d19(col("d2"))).as("s4"))
        .select(col("priority"), col("nn").as("n_orders"),
          expr(JbFormula.skew4).as("skew4"),
          expr(JbFormula.kurt4).as("kurt4"),
          expr(JbFormula.jb4).as("jb4"),
          expr(JbFormula.p6).as("p6"))
        .orderBy("priority")
    }),

    // Wald's sequential probability ratio test over the event stream
    // (Wald 1945, public textbook) — the SEQUENTIAL companion of
    // q276's fixed-horizon readout: walk the per-event purchase
    // log-likelihood ratio in arrival order and report where the walk
    // first exits the (−A, A) corridor, i.e. how early the experiment
    // could have stopped. Increments are the pre-quantized integer
    // ppm constants (SprtIncP/N — pure functions of the H0/H1 design,
    // embedded as literals in both engines), so the whole walk is ONE
    // integer cumSum over the event order: GlobalRank's value-bucketed
    // machinery, no global-sort window ([D5]; event_id is the
    // insertion total order). The crossing row attaches by one
    // broadcast-bounded min-struct aggregate; 'continue' when the
    // corridor never breaks.
    "q385_sprt" -> ((s, dir) => {
      val inc = t(s, dir, "events")
        .select(col("event_id"),
          when(col("event_type") === "purchase", lit(SprtIncP))
            .otherwise(lit(SprtIncN)).as("inc"))
        .withColumn("gg", lit(1))
      val cum = graft.functions.GlobalRank.cumSum(
        inc.groupBy("gg", "event_id")
          .agg(sum(col("inc")).as("w")), "gg", "event_id", "w")
      val totals = cum.groupBy("gg")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("w") === SprtIncP, 1L).otherwise(0L))
            .as("n_purchase"),
          sum(col("w")).as("llr_final_ppm"))
      val crossing = cum.filter(abs(col("cum")) >= SprtA)
        .groupBy("gg")
        .agg(min(struct(col("event_id"), col("cum"))).as("c"))
        .select(col("gg").as("gg2"), col("c.event_id").as("cross_id"),
          col("c.cum").as("cross_llr_ppm"))
      totals.join(crossing, col("gg") === col("gg2"), "left")
        .select(col("n_events"), col("n_purchase"),
          col("llr_final_ppm"), col("cross_id"), col("cross_llr_ppm"),
          when(col("cross_llr_ppm").isNull, "continue")
            .when(col("cross_llr_ppm") > 0, "accept_h1")
            .otherwise("accept_h0").as("decision"))
    }),

    // Per-source length-anomaly screen with Benjamini–Hochberg FDR
    // control (Mann–Whitney per source vs rest + BH 1995 step-up,
    // both public textbook) — the MULTIPLE-TESTING operator the stats
    // tier still lacked: q186 runs ONE rank test; a curation owner
    // screens EVERY source slice and needs the family-wise false-
    // discovery rate controlled, not per-test p's. Per source s:
    // midrank-sum U over the n_chars value histogram (the q186
    // midrank2 trick — 2·cum(<v)+t+1 over the GLOBAL histogram, so
    // one cumSum serves every source), tie-corrected normal z, the
    // two-sided p via the Abramowitz–Stegun 7.1.26 erfc polynomial
    // (|ε| < 1.5e-7 — pure arithmetic + exp, so both engines replay
    // it bit-for-bit; Spark/DuckDB ship no erfc builtin). BH runs on
    // the BOUNDED per-source row set: ranks and the step-up q-value
    // envelope via tiny self-joins (sources are a fixed dimension —
    // documented broadcast-bounded), reject at α = 0.05.
    "q372_bh_fdr" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val docs = t(s, dir, "documents")
        .select(col("source"), col("n_chars").cast("long").as("x"))
      val hs = docs.groupBy("source", "x").agg(count(lit(1)).as("cs"))
      val hAll = hs.groupBy("x").agg(sum(col("cs")).as("t"))
        .withColumn("gg", lit(1))
      val cumA = graft.functions.GlobalRank.cumSum(hAll, "gg", "x", "t")
        .withColumn("mr2", lit(2) * (col("cum") - col("t")) + col("t") + 1)
        .select(col("x"), col("mr2"))
      val glob = hAll.agg(sum(col("t")).as("n"),
        sum(d38(col("t")) * col("t") * col("t") - col("t")).as("tie3"))
      val per = hs.join(cumA, Seq("x"))
        .groupBy("source")
        .agg(sum(col("cs")).as("ns"),
          sum(d38(col("cs")) * col("mr2")).as("r2"))
        .crossJoin(broadcast(glob))
        .withColumn("u2", (col("r2")
          - d38(col("ns")) * (col("ns") + 1)).cast("long"))
        .withColumn("nr", col("n") - col("ns"))
        .withColumn("z4", expr(BhFormula.z4))
        .withColumn("p8", expr(BhFormula.p8))
      val mM = per.agg(count(lit(1)).as("m"))
      val pa = per.select(col("source"), col("ns"), col("z4"), col("p8"))
      val pb = pa.select(col("source").as("sb"), col("p8").as("pb"))
      val ranked = pa.join(broadcast(pb),
          col("pb") < col("p8") ||
            (col("pb") === col("p8") && col("sb") < col("source")),
          "left")
        .groupBy("source", "ns", "z4", "p8")
        .agg((count(col("sb")) + 1).as("bh_rank"))
        .crossJoin(broadcast(mM))
      val rb = ranked.select(col("bh_rank").as("rb"), col("p8").as("pj"))
      ranked.join(broadcast(rb), col("rb") >= col("bh_rank"))
        .groupBy("source", "ns", "z4", "p8", "bh_rank", "m")
        .agg(min(round(least(lit(1.0),
          col("pj") * col("m").cast("double") / col("rb").cast("double")),
          8)).as("qval8"))
        .select(col("source"), col("ns").as("n_docs"), col("z4"),
          col("p8"), col("bh_rank"), col("qval8"),
          (col("qval8") <= 0.05).cast("int").as("reject"))
        .orderBy("source")
    }),

    // Hill tail-index estimator (Hill 1975, public method) on order
    // values — the heavy-tail exponent behind capacity planning and
    // the q113 Zipf slope's transactional cousin (Zipf fits word
    // ranks; Hill asks how fat the REVENUE tail is: α ≈ 1 Pareto-80/20,
    // larger = thinner): α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the
    // top-k order statistics. The k+1 order statistics come through
    // the bounded-heap top-k ((cents desc, key asc) total order [D1]
    // — k+1 rows cross the exchange, never a sort); per-term logs
    // 8dp-quantized + decimal-summed [D2]; a flat top (all equal)
    // reports NULL, not Inf.
    "q375_hill_tail" -> ((s, dir) => {
      val v = t(s, dir, "orders").select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val top = graft.plans.GraftOps.topKPerGroup(v, Seq(lit(1)),
        Seq(col("cents").desc, col("o_orderkey").asc), HillK + 1,
        rankName = "rk")
      val thr = top.filter(col("rk") === HillK + 1)
        .select(col("cents").as("xmin"))
      top.filter(col("rk") <= HillK)
        .crossJoin(broadcast(thr))
        .agg(count(lit(1)).as("k"), max(col("xmin")).as("xmin_cents"),
          sum(round(log(col("cents").cast("double")
            / col("xmin").cast("double")), 8).cast("decimal(38,8)"))
            .as("slog"))
        .select(col("k"), col("xmin_cents"),
          when(col("slog") > 0,
            round(col("k").cast("double") / col("slog").cast("double"),
              4)).as("hill_alpha4"))
    }),

    // Ordinary least squares, closed form — the REGRESSION corner of
    // the ML tier (q235 classification, q247 clustering, q250
    // generative): per return flag, fit extendedprice ~ quantity +
    // discount by solving the 3×3 normal equations from ONE exact
    // moment pass (the q251 moment-matrix shape: 10 decimal sums,
    // map-side combinable — the irreducible closed-form-regression
    // cost at 100 TB; no gradient loop, no second scan). The
    // cofactor-inverse solve and R² are ONE double formula evaluated
    // from the exact decimal moments — and the formula STRING itself
    // is shared with the oracle SQL (OlsFormula), so both engines run
    // a textually identical IEEE expression tree; a singular normal
    // matrix (collinear regressors) reports NULL, not Inf [D3 6dp].
    "q254_ols_pricing" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val q = col("l_quantity").cast(Dec)
      val d = col("l_discount").cast(Dec)
      val y = col("l_extendedprice").cast(Dec)
      val m = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("cnt"),
        sum(q).as("m_sq"), sum(d).as("m_sd"), sum(y).as("m_sy"),
        sum(q * q).as("m_sqq"), sum(q * d).as("m_sqd"),
        sum(d * d).as("m_sdd"), sum(q * y).as("m_sqy"),
        sum(d * y).as("m_sdy"), sum(y * y).as("m_syy"))
      m.select(col("l_returnflag"), col("cnt").as("n_rows"),
          col("cnt").cast("double").as("n"),
          col("m_sq").cast("double").as("sq"),
          col("m_sd").cast("double").as("sd"),
          col("m_sy").cast("double").as("sy"),
          col("m_sqq").cast("double").as("sqq"),
          col("m_sqd").cast("double").as("sqd"),
          col("m_sdd").cast("double").as("sdd"),
          col("m_sqy").cast("double").as("sqy"),
          col("m_sdy").cast("double").as("sdy"),
          col("m_syy").cast("double").as("syy"))
        .select(col("l_returnflag"), col("n_rows"),
          expr(OlsFormula.b0Out).as("b0_6"),
          expr(OlsFormula.bqOut).as("b_qty_6"),
          expr(OlsFormula.bdOut).as("b_disc_6"),
          expr(OlsFormula.r2Out).as("r2_6"))
        .orderBy("l_returnflag")
    }),

    // Winsorized + trimmed means — the robust location estimators that
    // complete the q144-MAD family: per return flag, prices clamp to
    // (winsorize) or drop outside (trim) the exact P05/P95. The
    // percentiles are discrete picks off the value histogram + cumSum
    // (no per-group sort), selected by pure INTEGER comparison
    // (20·cum ≥ n, 20·cum ≥ 19·n) so there is no float p·n boundary to
    // disagree on; the 3-row bound table broadcasts back to the fact
    // rows and both means are exact decimal sums [D2].
    "q202_winsorize" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val hist = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
      val cum = graft.functions.GlobalRank.cumSum(
        hist, "l_returnflag", "l_extendedprice", "cnt")
      val bounds = cum.groupBy("l_returnflag").agg(
        min(when(col("cum") * 20 >= col("n"), col("l_extendedprice")))
          .as("p05"),
        min(when(col("cum") * 20 >= col("n") * 19, col("l_extendedprice")))
          .as("p95"))
      val kept = col("l_extendedprice") >= col("p05") &&
        col("l_extendedprice") <= col("p95")
      li.join(broadcast(bounds), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_lines"),
          max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          round(decSum(least(greatest(col("l_extendedprice"), col("p05")),
              col("p95"))).cast("double") / count(lit(1)), 4)
            .as("win_mean"),
          count(when(kept, 1)).as("n_kept"),
          round(decSum(when(kept, col("l_extendedprice"))).cast("double")
            / count(when(kept, 1)), 4).as("trim_mean"))
        .orderBy("l_returnflag")
    }),

    // Weekday-effect ANOVA — is the day-of-week pattern in daily
    // revenue SIGNIFICANT, not just visible (q168 shows the seasonal
    // means; q211 the dow×hour heatmap; this tests them)? One-way
    // ANOVA F of daily cents across the seven epoch-weekday groups,
    // reusing q331's BfFormula VERBATIM (it is generic one-way ANOVA
    // over per-group exact moments). The weekday is epoch-day mod 7 —
    // integer and engine-identical (Spark's dayofweek is 1-based
    // Sunday, DuckDB's 0-based: the portable form sidesteps the
    // convention split). Per-group mean [D5] integer-staged.
    "q357_weekday_anova" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val daily = t(s, dir, "orders")
        .groupBy(unix_micros(date_trunc("day", col("o_orderdate")))
          .as("day_us"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("z"))
        .select(expr("(day_us div 86400000000L) % 7").as("dow"),
          col("z"))
      val per = daily.groupBy("dow").agg(count(lit(1)).as("nj"),
        sum(col("z")).as("sj"), sum(d38(col("z")) * col("z")).as("qj"))
      val glob = per.agg(count(lit(1)).as("k"), sum(col("nj")).as("nn"),
        sum(col("sj")).as("ss"),
        sum(round(col("sj").cast("double") * col("sj").cast("double")
          / col("nj").cast("double"), 6).cast(Dec)).as("bb"),
        sum(col("qj").cast(Dec)).as("qq"))
      val stat = glob.select(col("k"), expr(BfFormula.f4).as("f4"))
      per.crossJoin(broadcast(stat))
        .select(col("dow"), col("nj").as("n_days"),
          (expr("(2 * sj * 10000 + nj) div (2 * nj)").cast("double")
            / 10000.0).as("mean_cents4"),
          col("k").as("n_groups"), col("f4"))
        .orderBy("dow")
    }),

    // Simpson's-paradox screen — does the price~quantity slope FLIP
    // sign between the pooled corpus and the per-return-flag strata?
    // (the aggregation-bias audit run before trusting any pooled
    // correlation; public textbook). One exact moment pass (integer
    // quantities × integer cents, the q254 decimal staging) yields
    // per-stratum AND pooled regression slopes from the same five
    // sums; the slope is one shared-string IEEE tree (SlopeFormula)
    // and the flip flag derives from the ROUNDED slopes, so both
    // engines compare identical values.
    "q344_simpson_flip" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val v = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      val per = v.groupBy("g").agg(count(lit(1)).as("nn"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(d38(col("x")) * col("x")).as("sxx"),
        sum(d38(col("x")) * col("y")).as("sxy"))
      val pooled = per.agg(sum(col("nn")).as("nn"),
          sum(col("sx")).as("sx"), sum(col("sy")).as("sy"),
          sum(col("sxx")).as("sxx"), sum(col("sxy")).as("sxy"))
        .select(expr(SlopeFormula.slope4).as("pooled_slope4"))
      per.select(col("g").as("flag"), col("nn").as("n_lines"),
          expr(SlopeFormula.slope4).as("slope4"))
        .crossJoin(broadcast(pooled))
        .withColumn("flip",
          when(col("slope4") * col("pooled_slope4") < 0, 1L)
            .otherwise(0L))
        .orderBy("flag")
    }),

    // Kruskal–Wallis H — the k-group extension of q186's rank test
    // (Mann–Whitney is the k = 2 special case): does order value
    // differ across the five order priorities? Ranks come from the
    // VALUE HISTOGRAM (integer-cents grid), never a row sort: one
    // (value, group) hash agg collapses the corpus,
    // GlobalRank.cumSum turns per-value totals into average ranks in
    // q186's exact 2·avg-rank integer form (r2 = 2(cum−t)+t+1 — no
    // .5 doubles), and each group's rank sum is an exact decimal
    // Σ c·r2. H and its tie correction are shared-string IEEE trees
    // (KwFormula) over the exact moments; the per-group s2²/n double
    // terms are 6dp-quantized and decimal-summed [D2]; the per-group
    // mean rank is [D5] integer-staged half-up. Two keyed aggs + a
    // 5-row final fold — map-side combinable at 100 TB.
    "q328_kruskal_wallis" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val v = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        round(col("o_totalprice") * 100).cast("long").as("x"))
      val cells = v.groupBy("g", "x").agg(count(lit(1)).as("c"))
      val hx = cells.groupBy("x").agg(sum(col("c")).as("t"))
        .withColumn("gg", lit(1))
      val r = graft.functions.GlobalRank.cumSum(hx, "gg", "x", "t")
        .withColumn("r2", lit(2) * (col("cum") - col("t")) + col("t") + 1)
      val per = cells.join(r.select(col("x"), col("r2")), Seq("x"))
        .groupBy("g").agg(sum(col("c")).as("nj"),
          sum(d38(col("c")) * col("r2")).as("s2j"))
      val ties = hx.agg(sum(d38(col("t")) * col("t") * col("t")
        - col("t")).as("tie3"))
      val glob = per.agg(sum(col("nj")).as("nn"),
          sum(round(col("s2j").cast("double") * col("s2j").cast("double")
            / col("nj").cast("double"), 6).cast(Dec)).as("sq"))
        .crossJoin(broadcast(ties))
        .select(col("nn"), expr(KwFormula.h4).as("h4"),
          expr(KwFormula.hc4).as("hc4"))
      per.crossJoin(broadcast(glob))
        .select(col("g").as("priority"), col("nj").as("n_orders"),
          (expr("(2 * s2j * 10000 + 2 * nj) div (4 * nj)").cast("double")
            / 10000.0).as("mean_rank4"),
          col("nn").as("n_total"), col("h4"), col("hc4"))
        .orderBy("priority")
    }),

    // Brown–Forsythe — Levene's variance-equality test made robust
    // with group MEDIANS (the recommended form): do the three return
    // flags have equal price spread, not just equal level (q186/q328
    // test location; this tests scale)? Stage 1 reuses q44's
    // histogram median (exact cents grid + GlobalRank.cumSum, no
    // per-group sort); stage 2 scores |x − medᵍ| exactly in integer
    // cents via a 3-row broadcast join; stage 3 is one-way ANOVA on
    // the deviations from per-group exact moments (n, Σz, Σz²
    // decimal-staged), the per-group s²/n double terms 6dp-quantized
    // and decimal-summed [D2], F one shared-string IEEE tree
    // (BfFormula), the per-group mean deviation [D5] integer-staged.
    // Two scans (median, then deviations) — the irreducible two-pass
    // cost of a median-centered statistic at 100 TB.
    "q331_brown_forsythe" -> ((s, dir) => {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("x"))
      val hist = li.groupBy("g", "x").agg(count(lit(1)).as("cnt"))
      val med = graft.functions.GlobalRank.cumSum(hist, "g", "x", "cnt")
        .groupBy("g")
        .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("x")))
          .as("med"))
      val z = li.join(broadcast(med), Seq("g"))
        .select(col("g"), abs(col("x") - col("med")).as("z"))
      val per = z.groupBy("g").agg(count(lit(1)).as("nj"),
        sum(col("z")).as("sj"), sum(d38(col("z")) * col("z")).as("qj"))
      val glob = per.agg(count(lit(1)).as("k"), sum(col("nj")).as("nn"),
        sum(col("sj")).as("ss"),
        sum(round(col("sj").cast("double") * col("sj").cast("double")
          / col("nj").cast("double"), 6).cast(Dec)).as("bb"),
        sum(col("qj").cast(Dec)).as("qq"))
      val stat = glob.select(col("k"), expr(BfFormula.f4).as("f4"))
      per.join(broadcast(med), Seq("g"))
        .crossJoin(broadcast(stat))
        .select(col("g").as("flag"), col("nj").as("n_lines"),
          col("med").as("med_cents"),
          (expr("(2 * cast(sj as decimal(38,0)) * 10000 + nj) " +
            "div (2 * nj)").cast("double") / 10000.0).as("mean_absdev4"),
          col("k").as("n_groups"), col("f4"))
        .orderBy("flag")
    })
  )

  /** The q276/q343 shared per-arm moment row: per-user purchase value
    * (6dp-rounded decimal sum → double, the q276 collapse), polyMix
    * parity arms [D1], and the six exact-decimal-staged moments
    * emitted as doubles — ONE definition, two keys gate it. */
  private def abMoments(s: SparkSession, dir: String): DataFrame = {
    val pu = t(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(round(sum(when(col("event_type") === "purchase",
          round(col("value"), 6).cast(Dec)).otherwise(lit(0).cast(Dec)))
        .cast("double"), 6).as("x"))
      .withColumn("arm", pmod(GraphQueries.polyMix(
        pmod(col("user_id"), lit(GraphQueries.HashM))), lit(2)))
    pu.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("double")
        .as("na"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("double")
        .as("nb"),
      sum(when(col("arm") === 0, col("x").cast(Dec))
        .otherwise(lit(0).cast(Dec))).cast("double").as("sa"),
      sum(when(col("arm") === 1, col("x").cast(Dec))
        .otherwise(lit(0).cast(Dec))).cast("double").as("sb"),
      sum(when(col("arm") === 0, (col("x") * col("x")).cast(Dec))
        .otherwise(lit(0).cast(Dec))).cast("double").as("sxa"),
      sum(when(col("arm") === 1, (col("x") * col("x")).cast(Dec))
        .otherwise(lit(0).cast(Dec))).cast("double").as("sxb"))
  }

  /** q343's effect-size trees over the q276 moment names — shared
    * text, one IEEE tree each. Sample sums of squares; d uses the
    * pooled sd, g the Hedges small-sample factor 1 − 3/(4N − 9);
    * the variance ratio is NULL on a degenerate arm. */
  private[operators] object EffectFormula {
    private val ma = "(sa / na)"
    private val mb = "(sb / nb)"
    private val ssa = "(sxa - sa * sa / na)"
    private val ssb = "(sxb - sb * sb / nb)"
    private val sp = s"sqrt(($ssa + $ssb) / (na + nb - 2.0))"
    private val dRaw = s"(($mb - $ma) / $sp)"
    val d4: String = s"CASE WHEN $ssa + $ssb > 0 AND na + nb > 2 " +
      s"THEN round($dRaw, 4) END"
    val g4: String = s"CASE WHEN $ssa + $ssb > 0 AND na + nb > 2 " +
      s"THEN round($dRaw * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 4) END"
    val lnvr4: String = s"CASE WHEN $ssa > 0 AND $ssb > 0 " +
      s"AND na > 1 AND nb > 1 THEN " +
      s"round(0.5 * ln(($ssb / (nb - 1.0)) / ($ssa / (na - 1.0))), 4) END"
  }

  /** q351's power trees over the q276 moment names — shared text, one
    * IEEE tree each. SE uses per-arm sample variances; the z sum
    * (z_{0.025} + z_{0.2} = 1.9599… + 0.8416…) is pre-evaluated to
    * one shortest-roundtrip double literal so both engines parse the
    * identical constant (Spark reads inline decimal literals as
    * DECIMAL — the q336 lesson). */
  private[operators] object PowerFormula {
    private val ZSum = "2.8015852181129683E0"
    private val ssa = "(sxa - sa * sa / na)"
    private val ssb = "(sxb - sb * sb / nb)"
    private val se =
      s"sqrt($ssa / (na - 1.0) / na + $ssb / (nb - 1.0) / nb)"
    private val guard = "na > 1 AND nb > 1"
    val se4: String = s"CASE WHEN $guard THEN round($se, 4) END"
    val mde4: String = s"CASE WHEN $guard THEN round($ZSum * $se, 4) END"
    val mdeRel4: String = s"CASE WHEN $guard AND sa > 0 THEN " +
      s"round($ZSum * $se / (sa / na), 4) END"
  }

  /** q276's derived-metric formulas over the double moment names
    * (na, nb, sa, sb, sxa, sxb) — the q254 shared-text convention: the
    * SAME strings run through Spark `expr()` and the DuckDB oracle, so
    * the IEEE expression trees match by construction. Population
    * variances; Welch t NULL when both arms are constant. */
  private val AbFormula: Map[String, String] = {
    val ma = "(sa / na)"
    val mb = "(sb / nb)"
    val va = s"(sxa / na - $ma * $ma)"
    val vb = s"(sxb / nb - $mb * $mb)"
    val se2 = s"($va / na + $vb / nb)"
    val e = "((na + nb) / 2)"
    Map(
      "mean_a4" -> s"ROUND($ma, 4)",
      "mean_b4" -> s"ROUND($mb, 4)",
      "lift4" -> s"ROUND($mb - $ma, 4)",
      "t4" -> (s"ROUND(CASE WHEN $se2 > 0 THEN ($mb - $ma) / sqrt($se2) " +
        "END, 4)"),
      "srm_chi4" -> (s"ROUND(((na - $e) * (na - $e) " +
        s"+ (nb - $e) * (nb - $e)) / $e, 4)"))
  }

  /** The q276/q343 oracle-side moment CTE chain (`pu` → `st`) —
    * mirrors [[abMoments]] term for term; one definition, two keys. */
  private def abMomentsCteSql: String =
    s"""pu AS (
       |  SELECT user_id,
       |         (${GraphQueries.polyMixSql(
            GraphQueries.pmodSql("user_id"))}) % 2 AS arm,
       |         ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'
       |                THEN CAST(ROUND(value, 6) AS DECIMAL(38,6))
       |                ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE), 6)
       |           AS x
       |  FROM events WHERE user_id IS NOT NULL
       |  GROUP BY 1, 2),
       |st AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |      AS na,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |      AS nb,
       |    CAST(SUM(CASE WHEN arm = 0 THEN CAST(x AS DECIMAL(38,6))
       |             ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS sa,
       |    CAST(SUM(CASE WHEN arm = 1 THEN CAST(x AS DECIMAL(38,6))
       |             ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS sb,
       |    CAST(SUM(CASE WHEN arm = 0 THEN CAST(x * x AS DECIMAL(38,6))
       |             ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS sxa,
       |    CAST(SUM(CASE WHEN arm = 1 THEN CAST(x * x AS DECIMAL(38,6))
       |             ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS sxb
       |  FROM pu)""".stripMargin

  val oracle: Map[String, String] = Map(
    // the same (cents desc, key asc) order statistics via ROW_NUMBER,
    // 8dp decimal log terms, flat-top NULL guard
    "q375_hill_tail" ->
      s"""WITH v AS (
         |  SELECT o_orderkey,
         |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |top AS (
         |  SELECT cents, rk FROM (
         |    SELECT cents, ROW_NUMBER() OVER (
         |      ORDER BY cents DESC, o_orderkey ASC) AS rk FROM v) z
         |  WHERE rk <= ${HillK + 1}),
         |thr AS (SELECT cents AS xmin FROM top WHERE rk = ${HillK + 1}),
         |ag AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |         CAST(MAX(xmin) AS BIGINT) AS xmin_cents,
         |         SUM(CAST(ROUND(LN(CAST(cents AS DOUBLE)
         |           / CAST(xmin AS DOUBLE)), 8) AS DECIMAL(38,8)))
         |           AS slog
         |  FROM top CROSS JOIN thr WHERE rk <= $HillK)
         |SELECT k, xmin_cents,
         |       CASE WHEN slog > 0 THEN
         |         ROUND(CAST(k AS DOUBLE) / CAST(slog AS DOUBLE), 4)
         |       END AS hill_alpha4
         |FROM ag""".stripMargin,

    // the same merged histogram, per-side window cumulatives, lead()
    // segment gaps, HUGEINT cross-mass terms, one final division
    "q380_wasserstein" ->
      s"""WITH d AS (
         |  SELECT (source = '$WassFocus') AS isf,
         |         CAST(n_chars AS BIGINT) AS x
         |  FROM documents),
         |h AS (
         |  SELECT x,
         |         CAST(SUM(CASE WHEN isf THEN 1 ELSE 0 END) AS BIGINT)
         |           AS ca,
         |         CAST(SUM(CASE WHEN isf THEN 0 ELSE 1 END) AS BIGINT)
         |           AS cb
         |  FROM d GROUP BY 1),
         |c AS (
         |  SELECT x,
         |         CAST(SUM(ca) OVER (ORDER BY x ASC) AS BIGINT) AS cuma,
         |         CAST(SUM(cb) OVER (ORDER BY x ASC) AS BIGINT) AS cumb,
         |         CAST(SUM(ca) OVER () AS BIGINT) AS na,
         |         CAST(SUM(cb) OVER () AS BIGINT) AS nb,
         |         lead(x) OVER (ORDER BY x ASC) - x AS gap
         |  FROM h),
         |seg AS (
         |  SELECT na, nb,
         |         SUM(abs(CAST(cuma AS HUGEINT) * nb
         |           - CAST(cumb AS HUGEINT) * na) * gap) AS st
         |  FROM c WHERE gap IS NOT NULL GROUP BY 1, 2)
         |SELECT na AS n_focus, nb AS n_rest,
         |       ROUND(CAST(st AS DOUBLE)
         |         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
         |         AS w1_chars6
         |FROM seg""".stripMargin,

    // the same complete-block filter, milli-char cell means, exact
    // 2-midrank integers from the bounded self-join, SAME trees
    "q394_friedman" ->
      s"""WITH cells AS (
         |  SELECT source, lang, COUNT(*) AS cnt,
         |         CAST(SUM(n_chars) AS BIGINT) AS sc
         |  FROM documents GROUP BY 1, 2),
         |c2 AS (SELECT source, lang, (sc * 1000) // cnt AS mc
         |       FROM cells),
         |complete AS (
         |  SELECT source FROM c2 GROUP BY 1 HAVING COUNT(*) = 5),
         |cc AS (SELECT c2.* FROM c2 JOIN complete USING (source)),
         |r2 AS (
         |  SELECT a.source, a.lang,
         |         CAST(SUM(CASE WHEN b.mc < a.mc THEN 2 ELSE 0 END)
         |              + SUM(CASE WHEN b.mc = a.mc THEN 1 ELSE 0 END)
         |              + 1 AS BIGINT) AS r2
         |  FROM cc a JOIN cc b ON a.source = b.source
         |  GROUP BY 1, 2),
         |pl AS (SELECT lang, CAST(SUM(r2) AS BIGINT) AS sr2
         |       FROM r2 GROUP BY 1),
         |m AS (
         |  SELECT COUNT(*) AS k, CAST(SUM(sr2 * sr2) AS BIGINT) AS ssr2
         |  FROM pl),
         |bb AS (SELECT COUNT(*) AS b FROM complete)
         |SELECT CAST(b AS BIGINT) AS b, CAST(k AS BIGINT) AS k,
         |       ${FriedmanFormula.chi24} AS chi2_4,
         |       ${FriedmanFormula.p6} AS p6
         |FROM m CROSS JOIN bb""".stripMargin,

    // identical segment cells and exact-cent moment sums, the 6dp
    // per-group term quantization, and the SAME EtaFormula trees
    "q391_eta_squared" ->
      s"""WITH v AS (
         |  SELECT c.c_mktsegment AS seg,
         |         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS x
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         |per AS (
         |  SELECT seg, COUNT(*) AS ng,
         |         CAST(SUM(x) AS BIGINT) AS s1g,
         |         SUM(CAST(x AS HUGEINT) * x) AS s2g
         |  FROM v GROUP BY 1),
         |m AS (
         |  SELECT COUNT(*) AS k,
         |         CAST(SUM(ng) AS BIGINT) AS nn,
         |         CAST(SUM(s1g) AS BIGINT) AS s1,
         |         SUM(s2g) AS s2,
         |         SUM(CAST(ROUND(CAST(s1g AS DOUBLE)
         |                        * CAST(s1g AS DOUBLE) / ng, 6)
         |             AS DECIMAL(38,6))) AS sb
         |  FROM per)
         |SELECT CAST(k AS BIGINT) AS k, nn AS n_orders,
         |       ${EtaFormula.eta26} AS eta2_6,
         |       ${EtaFormula.omega26} AS omega2_6
         |FROM m""".stripMargin,

    // identical integer-dollar staging (exact cents then truncating
    // div), HUGEINT moment products mirroring Spark's decimal(19)
    // pairs (both exact integers), the SAME JbFormula trees
    "q384_jarque_bera" ->
      s"""WITH v AS (
         |  SELECT o_orderpriority AS priority,
         |         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS d
         |  FROM orders),
         |m AS (
         |  SELECT priority, COUNT(*) AS nn,
         |         CAST(SUM(d) AS BIGINT) AS s1,
         |         SUM(CAST(d AS HUGEINT) * d) AS s2,
         |         SUM(CAST(d AS HUGEINT) * d * d) AS s3,
         |         SUM(CAST(d AS HUGEINT) * d * d * d) AS s4
         |  FROM v GROUP BY 1)
         |SELECT priority, CAST(nn AS BIGINT) AS n_orders,
         |       ${JbFormula.skew4} AS skew4,
         |       ${JbFormula.kurt4} AS kurt4,
         |       ${JbFormula.jb4} AS jb4,
         |       ${JbFormula.p6} AS p6
         |FROM m ORDER BY priority ASC NULLS FIRST""".stripMargin,

    // the same integer-ppm increments as literals, the walk as one
    // window cumsum (DuckDB's global window replays Spark's bucketed
    // cumSum exactly — both are the inclusive prefix sum over the
    // event_id total order), first crossing by ORDER/LIMIT 1
    "q385_sprt" ->
      s"""WITH inc AS (
         |  SELECT event_id,
         |         CASE WHEN event_type = 'purchase' THEN ${SprtIncP}
         |              ELSE ${SprtIncN} END AS w
         |  FROM events),
         |c AS (
         |  SELECT event_id,
         |         CAST(SUM(w) OVER (ORDER BY event_id ASC) AS BIGINT)
         |           AS cum
         |  FROM inc),
         |tot AS (
         |  SELECT COUNT(*) AS n_events,
         |         CAST(SUM(CASE WHEN w = ${SprtIncP} THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_purchase,
         |         CAST(SUM(w) AS BIGINT) AS llr_final_ppm
         |  FROM inc),
         |x AS (
         |  SELECT event_id AS cross_id, cum AS cross_llr_ppm
         |  FROM c WHERE abs(cum) >= ${SprtA}
         |  ORDER BY event_id ASC LIMIT 1)
         |SELECT CAST(n_events AS BIGINT) AS n_events, n_purchase,
         |       llr_final_ppm, cross_id, cross_llr_ppm,
         |       CASE WHEN cross_llr_ppm IS NULL THEN 'continue'
         |            WHEN cross_llr_ppm > 0 THEN 'accept_h1'
         |            ELSE 'accept_h0' END AS decision
         |FROM tot LEFT JOIN x ON TRUE""".stripMargin,

    // the same global-histogram midrank chain, HUGEINT staging, SAME
    // z/erfc trees, and the bounded self-join rank + step-up envelope
    "q372_bh_fdr" ->
      s"""WITH d AS (
         |  SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
         |hs AS (SELECT source, x, CAST(COUNT(*) AS BIGINT) AS cs
         |       FROM d GROUP BY 1, 2),
         |ha AS (SELECT x, CAST(SUM(cs) AS BIGINT) AS t
         |       FROM hs GROUP BY 1),
         |cum AS (SELECT x, t,
         |               CAST(SUM(t) OVER (ORDER BY x ASC) AS BIGINT)
         |                 AS cum
         |        FROM ha),
         |mr AS (SELECT x, 2 * (cum - t) + t + 1 AS mr2 FROM cum),
         |gl AS (
         |  SELECT CAST(SUM(t) AS BIGINT) AS n,
         |         SUM(CAST(t AS HUGEINT) * t * t - t) AS tie3
         |  FROM ha),
         |per AS (
         |  SELECT hs.source, CAST(SUM(cs) AS BIGINT) AS ns,
         |         SUM(CAST(cs AS HUGEINT) * mr.mr2) AS r2
         |  FROM hs JOIN mr USING (x) GROUP BY 1),
         |sc AS (
         |  SELECT source, ns,
         |         CAST(r2 - CAST(ns AS HUGEINT) * (ns + 1) AS BIGINT)
         |           AS u2,
         |         n - ns AS nr, n, tie3
         |  FROM per CROSS JOIN gl),
         |zz AS (SELECT source, ns, ${BhFormula.z4} AS z4 FROM sc),
         |pp AS (SELECT source, ns, z4, ${BhFormula.p8} AS p8 FROM zz),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pp),
         |rk AS (
         |  SELECT a.source, a.ns, a.z4, a.p8,
         |         CAST(1 + COUNT(b.source) AS BIGINT) AS bh_rank
         |  FROM pp a LEFT JOIN pp b
         |    ON b.p8 < a.p8 OR (b.p8 = a.p8 AND b.source < a.source)
         |  GROUP BY 1, 2, 3, 4),
         |qv AS (
         |  SELECT a.source, a.ns, a.z4, a.p8, a.bh_rank, mm.m,
         |         MIN(ROUND(LEAST(1.0, b.p8 * CAST(mm.m AS DOUBLE)
         |           / CAST(b.bh_rank AS DOUBLE)), 8)) AS qval8
         |  FROM rk a CROSS JOIN mm
         |  JOIN rk b ON b.bh_rank >= a.bh_rank
         |  GROUP BY 1, 2, 3, 4, 5, 6)
         |SELECT source, ns AS n_docs, z4, p8, bh_rank, qval8,
         |       CAST(CASE WHEN qval8 <= 0.05 THEN 1 ELSE 0 END
         |         AS INTEGER) AS reject
         |FROM qv ORDER BY source ASC NULLS FIRST""".stripMargin,
    // the identical seeded polyMix draw chain, equi-join resolution,
    // exact integer replicate totals, and rank-picked bounds
    "q297_bootstrap_ci" -> {
      val drawSql = GraphQueries.polyMixSql(
        GraphQueries.pmodSql("reps.b * nn.n + rk.r"))
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |rk AS (SELECT cents,
         |              ROW_NUMBER() OVER (ORDER BY day ASC) - 1 AS r
         |       FROM daily),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
         |reps AS (SELECT CAST(unnest(range(0, $BootB)) AS BIGINT) AS b),
         |draws AS (
         |  SELECT reps.b, ($drawSql) % nn.n AS idx
         |  FROM rk CROSS JOIN reps CROSS JOIN nn),
         |tot AS (
         |  SELECT d.b, CAST(SUM(rk.cents) AS BIGINT) AS t
         |  FROM draws d JOIN rk ON rk.r = d.idx
         |  GROUP BY 1),
         |h AS (SELECT t, COUNT(*) AS cnt FROM tot GROUP BY 1),
         |cum AS (SELECT t, SUM(cnt) OVER (ORDER BY t ASC) AS cum FROM h),
         |pick AS (
         |  SELECT MIN(CASE WHEN cum >= $BootLoRank THEN t END) AS lo,
         |         MIN(CASE WHEN cum >= $BootHiRank THEN t END) AS hi
         |  FROM cum),
         |orig AS (SELECT CAST(SUM(cents) AS BIGINT) AS t0 FROM daily)
         |SELECT nn.n AS n_days, CAST($BootB AS BIGINT) AS n_boot,
         |       ROUND(CAST(t0 AS DOUBLE) / CAST(nn.n AS DOUBLE) / 100, 6)
         |         AS mean6,
         |       ROUND(CAST(lo AS DOUBLE) / CAST(nn.n AS DOUBLE) / 100, 6)
         |         AS lo6,
         |       ROUND(CAST(hi AS DOUBLE) / CAST(nn.n AS DOUBLE) / 100, 6)
         |         AS hi6
         |FROM pick CROSS JOIN orig CROSS JOIN nn""".stripMargin
    },

    // identical per-customer collapse, polyMix arms, one moment row,
    // and the SAME CUPED trees
    "q322_ab_cuped" -> {
      val armSql = s"(${GraphQueries.polyMixSql(
        GraphQueries.pmodSql("o_custkey"))}) % 2"
      s"""WITH pc AS (
         |  SELECT o_custkey,
         |         CAST(SUM(CASE WHEN year(o_orderdate) < 1996
         |             THEN CAST(round(o_totalprice * 100) AS BIGINT)
         |             ELSE 0 END) AS BIGINT) AS x,
         |         CAST(SUM(CASE WHEN year(o_orderdate) >= 1996
         |             THEN CAST(round(o_totalprice * 100) AS BIGINT)
         |             ELSE 0 END) AS BIGINT) AS y
         |  FROM orders GROUP BY 1),
         |pa AS (SELECT x, y, $armSql AS arm FROM pc),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(x) AS BIGINT) AS sx,
         |         CAST(SUM(y) AS BIGINT) AS sy,
         |         CAST(SUM(CAST(x AS DECIMAL(19,0))
         |           * CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxx,
         |         CAST(SUM(CAST(y AS DECIMAL(19,0))
         |           * CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS syy,
         |         CAST(SUM(CAST(x AS DECIMAL(19,0))
         |           * CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxy,
         |         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS na,
         |         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS nb,
         |         CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END)
         |           AS BIGINT) AS sxa,
         |         CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END)
         |           AS BIGINT) AS sxb,
         |         CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END)
         |           AS BIGINT) AS sya,
         |         CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END)
         |           AS BIGINT) AS syb
         |  FROM pa)
         |SELECT na AS n_a, nb AS n_b,
         |       ${CupedFormula.theta6} AS theta6,
         |       ${CupedFormula.liftRaw4} AS lift_raw4,
         |       ${CupedFormula.liftCuped4} AS lift_cuped4,
         |       ${CupedFormula.rho2_6} AS rho2_6
         |FROM m""".stripMargin
    },

    // the identical bin collapse, exact integer moments, and the SAME
    // χ² text
    "q312_cochran_armitage" ->
      s"""WITH bins AS (
         |  SELECT least(CAST(round(o_totalprice * 100) AS BIGINT)
         |           // 5000000, 9) AS w,
         |         CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CASE WHEN o_orderstatus = 'F'
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS s
         |  FROM orders GROUP BY 1),
         |m AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         |         CAST(SUM(s) AS BIGINT) AS ss,
         |         CAST(SUM(w * n) AS BIGINT) AS sw1,
         |         CAST(SUM(w * w * n) AS BIGINT) AS sw2,
         |         CAST(SUM(w * s) AS BIGINT) AS sws
         |  FROM bins)
         |SELECT nn AS n_orders, ss AS n_fulfilled,
         |       ${CaFormula.chi4} AS ca_chi4
         |FROM m""".stripMargin,

    // identical histogram median pick, tie drop, spine adjacency,
    // and the SAME E/Var/z text
    "q314_runs_test" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |h AS (SELECT cents, COUNT(*) AS cnt FROM daily GROUP BY 1),
         |cum AS (
         |  SELECT cents, SUM(cnt) OVER (ORDER BY cents ASC) AS cum,
         |         (SELECT COUNT(*) FROM daily) AS n
         |  FROM h),
         |med AS (
         |  SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
         |    AS med FROM cum),
         |kept AS (
         |  SELECT day,
         |         CAST(CASE WHEN cents > med THEN 1 ELSE 0 END AS BIGINT)
         |           AS f
         |  FROM daily CROSS JOIN med WHERE cents != med),
         |rk AS (SELECT f, ROW_NUMBER() OVER (ORDER BY day ASC) AS rn
         |       FROM kept),
         |tr AS (
         |  SELECT CAST(SUM(CASE WHEN a.f != b.f THEN 1 ELSE 0 END)
         |    AS BIGINT) AS tr
         |  FROM rk a JOIN rk b ON b.rn = a.rn - 1),
         |cc AS (
         |  SELECT CAST(SUM(f) AS BIGINT) AS n1,
         |         CAST(SUM(1 - f) AS BIGINT) AS n2
         |  FROM rk),
         |fin AS (
         |  SELECT cc.n1, cc.n2, tr.tr + 1 AS n_runs
         |  FROM cc CROSS JOIN tr)
         |SELECT n1, n2, n_runs, ${RunsFormula.z4} AS z4
         |FROM fin""".stripMargin,

    // the identical rank spine, lag-shift equi-join, moment sums, and
    // the SAME r_h formula text; terms 8dp-quantized + decimal-summed
    "q302_ljung_box" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |dd AS (SELECT ROW_NUMBER() OVER (ORDER BY day ASC) AS rn,
         |              cents AS x
         |       FROM daily),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dd),
         |gm AS (
         |  SELECT CAST(SUM(x) AS BIGINT) AS sx,
         |         CAST(SUM(CAST(x AS DECIMAL(19,0))
         |           * CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxx
         |  FROM dd),
         |lags AS (SELECT CAST(unnest(range(1, ${LbMaxLag + 1}))
         |           AS BIGINT) AS h),
         |cells AS (
         |  SELECT s.h, CAST(COUNT(*) AS BIGINT) AS cnt,
         |         CAST(SUM(a.x) AS BIGINT) AS sa,
         |         CAST(SUM(s.y) AS BIGINT) AS sb,
         |         CAST(SUM(CAST(a.x AS DECIMAL(19,0))
         |           * CAST(s.y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxy
         |  FROM dd a
         |  JOIN (SELECT dd.rn + lags.h AS rn, lags.h, dd.x AS y
         |        FROM dd CROSS JOIN lags) s ON s.rn = a.rn
         |  GROUP BY 1),
         |rr AS (
         |  SELECT cells.h, cells.cnt, ${LbFormula.r6} AS r6
         |  FROM cells CROSS JOIN gm CROSS JOIN nn),
         |tt AS (
         |  SELECT h, cnt, r6,
         |         CAST(ROUND(r6 * r6 / CAST(cnt AS DOUBLE), 8)
         |           AS DECIMAL(38,8)) AS term
         |  FROM rr),
         |lb AS (
         |  SELECT ROUND(CAST(nn.n * (nn.n + 2) AS DOUBLE)
         |           * CAST(SUM(term) AS DOUBLE), 4) AS lb4
         |  FROM tt CROSS JOIN nn GROUP BY nn.n)
         |SELECT tt.h AS lag, tt.cnt AS n_pairs, tt.r6, lb.lb4
         |FROM tt CROSS JOIN lb
         |ORDER BY lag ASC NULLS FIRST""".stripMargin,

    // the identical weekly pairing, seeded polyMix parity flips, and
    // exact integer replicate statistics; isodow ≥ 6 ⇔ weekday ≥ 5
    "q300_permutation_test" -> {
      val bitSql = GraphQueries.polyMixSql(
        GraphQueries.pmodSql("reps.b * nn.n + dd.r"))
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |wk AS (
         |  SELECT date_trunc('week', day) AS w,
         |         CAST(SUM(CASE WHEN isodow(day) >= 6 THEN cents
         |                  ELSE 0 END) AS BIGINT) AS swe,
         |         CAST(SUM(CASE WHEN isodow(day) < 6 THEN cents
         |                  ELSE 0 END) AS BIGINT) AS swd,
         |         CAST(SUM(CASE WHEN isodow(day) >= 6 THEN 1
         |                  ELSE 0 END) AS BIGINT) AS cwe,
         |         CAST(SUM(CASE WHEN isodow(day) < 6 THEN 1
         |                  ELSE 0 END) AS BIGINT) AS cwd
         |  FROM daily GROUP BY 1),
         |dd AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY w ASC) - 1 AS r,
         |         swe * cwd - swd * cwe AS d
         |  FROM wk WHERE cwe > 0 AND cwd > 0),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dd),
         |t0 AS (SELECT CAST(SUM(d) AS BIGINT) AS t0 FROM dd),
         |reps AS (SELECT CAST(unnest(range(0, $PermB)) AS BIGINT) AS b),
         |tb AS (
         |  SELECT reps.b,
         |         CAST(SUM((1 - 2 * (($bitSql) % 2)) * dd.d) AS BIGINT)
         |           AS tb
         |  FROM dd CROSS JOIN reps CROSS JOIN nn
         |  GROUP BY 1),
         |ge AS (
         |  SELECT CAST(SUM(CASE WHEN abs(tb.tb) >= abs(t0.t0)
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
         |  FROM tb CROSS JOIN t0)
         |SELECT nn.n AS n_weeks, t0.t0 AS t0,
         |       CAST($PermB AS BIGINT) AS n_perm, ge.n_ge,
         |       ROUND(CAST(ge.n_ge + 1 AS DOUBLE)
         |         / CAST(${PermB + 1} AS DOUBLE), 6) AS p6
         |FROM ge CROSS JOIN t0 CROSS JOIN nn""".stripMargin
    },

    // identical bin collapse, prefix sums, and the minimax identity
    // over (k ≤ i ≤ j) prefix windows — IEEE ratios of exact ints
    "q296_isotonic" ->
      """WITH bins AS (
        |  SELECT least(CAST(round(o_totalprice * 100) AS BIGINT)
        |           // 5000000, 9) AS bin,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS s
        |  FROM orders GROUP BY 1),
        |pre AS (
        |  SELECT a.bin, CAST(SUM(b.n) AS BIGINT) AS nn,
        |         CAST(SUM(b.s) AS BIGINT) AS ss
        |  FROM bins a JOIN bins b ON b.bin <= a.bin
        |  GROUP BY 1),
        |pk AS (
        |  SELECT k.bin AS k, COALESCE(p.nn, 0) AS pn,
        |         COALESCE(p.ss, 0) AS ps
        |  FROM bins k LEFT JOIN pre p ON p.bin = k.bin - 1),
        |rate AS (
        |  SELECT pk.k, pj.bin AS j,
        |         CAST(pj.ss - pk.ps AS DOUBLE)
        |           / CAST(pj.nn - pk.pn AS DOUBLE) AS r
        |  FROM pk JOIN pre pj ON pj.bin >= pk.k),
        |g1 AS (
        |  SELECT i.bin AS i, rate.j, MAX(rate.r) AS mx
        |  FROM bins i JOIN rate ON rate.k <= i.bin AND rate.j >= i.bin
        |  GROUP BY 1, 2),
        |iso AS (SELECT i, MIN(mx) AS iso FROM g1 GROUP BY 1)
        |SELECT b.bin, b.n, b.s,
        |       ROUND(CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE), 6)
        |         AS rate6,
        |       ROUND(iso.iso, 6) AS iso6
        |FROM iso JOIN bins b ON b.bin = iso.i
        |ORDER BY b.bin ASC NULLS FIRST""".stripMargin,

    // the q162 oracle shape on the priority×segment grid + the SAME
    // V formula text over (chi2, ntot, nr, nc)
    "q287_cramers_v" ->
      s"""WITH obs AS (
         |  SELECT o.o_orderpriority AS pri, c.c_mktsegment AS seg,
         |         COUNT(*) AS o
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2),
         |rt AS (SELECT pri, SUM(o) AS r FROM obs GROUP BY 1),
         |ct AS (SELECT seg, SUM(o) AS c FROM obs GROUP BY 1),
         |nt AS (SELECT SUM(o) AS ntot FROM obs),
         |dims AS (
         |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS nr,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS nc),
         |cells AS (
         |  SELECT rt.pri, ct.seg, COALESCE(obs.o, 0) AS o,
         |         rt.r, ct.c, nt.ntot
         |  FROM rt CROSS JOIN ct CROSS JOIN nt
         |  LEFT JOIN obs ON obs.pri = rt.pri AND obs.seg = ct.seg),
         |contrib AS (
         |  SELECT ntot, ROUND(
         |    CAST(CAST(o AS HUGEINT) * ntot - CAST(r AS HUGEINT) * c
         |         AS DOUBLE)
         |    * CAST(CAST(o AS HUGEINT) * ntot - CAST(r AS HUGEINT) * c
         |           AS DOUBLE)
         |    / CAST(CAST(ntot AS HUGEINT) * r * c AS DOUBLE), 6) AS tt
         |  FROM cells),
         |agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         |         CAST(MAX(ntot) AS BIGINT) AS ntot,
         |         CAST(SUM(CAST(tt AS DECIMAL(38,6))) AS DOUBLE) AS chi2
         |  FROM contrib)
         |SELECT n_cells, chi2, ${CramersFormula.v6} AS v6
         |FROM agg CROSS JOIN dims""".stripMargin,

    // the identical value-grid contingency construction, half-grid
    // C−D pass, tie terms, and the SAME tau formula text
    "q286_kendall_tau" ->
      s"""WITH v AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS x,
         |         CAST(round(l_discount * 100) AS BIGINT) AS y
         |  FROM lineitem),
         |cells AS (SELECT x, y, COUNT(*) AS c FROM v GROUP BY 1, 2),
         |cd AS (
         |  SELECT CAST(SUM(CAST(a.c AS HUGEINT) * b.c *
         |           (CASE WHEN b.y > a.y THEN 1
         |                 WHEN b.y < a.y THEN -1 ELSE 0 END))
         |         AS HUGEINT) AS cmd
         |  FROM cells a JOIN cells b ON b.x > a.x),
         |tx AS (
         |  SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT)
         |           AS t2x
         |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS t
         |        FROM cells GROUP BY x) z),
         |ty AS (
         |  SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT)
         |           AS t2y
         |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS t
         |        FROM cells GROUP BY y) z),
         |nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM v),
         |m AS (
         |  SELECT cmd, n,
         |         n * (n - 1) - t2x AS dx,
         |         n * (n - 1) - t2y AS dy
         |  FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN nn)
         |SELECT CAST(n AS BIGINT) AS n_rows,
         |       CAST(cmd AS BIGINT) AS c_minus_d,
         |       ${KendallFormula.tau6} AS tau6
         |FROM m""".stripMargin,

    // identical per-user decimal revenue staging, the same polyMix
    // arm, the same one-row moment aggregate, the SAME formula text
    "q276_ab_lift" ->
      s"""WITH $abMomentsCteSql
         |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         |       ${AbFormula("mean_a4")} AS mean_a4,
         |       ${AbFormula("mean_b4")} AS mean_b4,
         |       ${AbFormula("lift4")} AS lift4,
         |       ${AbFormula("t4")} AS t4,
         |       ${AbFormula("srm_chi4")} AS srm_chi4
         |FROM st""".stripMargin,

    // the effect-size replay: the SHARED moment CTE (one definition,
    // two keys) + the SAME EffectFormula trees
    "q343_effect_size" ->
      s"""WITH $abMomentsCteSql
         |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         |       ${EffectFormula.d4} AS d4,
         |       ${EffectFormula.g4} AS g4,
         |       ${EffectFormula.lnvr4} AS lnvr4
         |FROM st""".stripMargin,

    // the power replay: the SHARED moment CTE (third consumer) + the
    // SAME PowerFormula trees
    "q351_mde_power" ->
      s"""WITH $abMomentsCteSql
         |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         |       ${PowerFormula.se4} AS se4,
         |       ${PowerFormula.mde4} AS mde4,
         |       ${PowerFormula.mdeRel4} AS mde_rel4
         |FROM st""".stripMargin,

    // the sampled-quantile replay: identical polyMix row predicate,
    // window cumulative sum over the value histogram, same integer
    // ceil thresholds — the picked prices are data values, no
    // arithmetic to diverge
    "q240_sampled_quantiles" ->
      s"""WITH samp AS (
         |  SELECT l_returnflag, l_extendedprice FROM lineitem
         |  WHERE (${GraphQueries.pairMixSql("l_orderkey", "l_linenumber")})
         |        % 16 = 0),
         |h AS (
         |  SELECT l_returnflag, l_extendedprice, COUNT(*) AS cnt
         |  FROM samp GROUP BY 1, 2),
         |c AS (
         |  SELECT l_returnflag, l_extendedprice,
         |         SUM(cnt) OVER (PARTITION BY l_returnflag
         |           ORDER BY l_extendedprice ASC) AS cum,
         |         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
         |  FROM h)
         |SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_sample,
         |       MIN(CASE WHEN cum * 4 >= n THEN l_extendedprice END) AS p25,
         |       MIN(CASE WHEN cum * 2 >= n THEN l_extendedprice END) AS p50,
         |       MIN(CASE WHEN cum * 4 >= n * 3 THEN l_extendedprice END)
         |         AS p75
         |FROM c GROUP BY 1
         |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

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
        |ORDER BY digit ASC NULLS FIRST""".stripMargin,

    "q162_chi2" ->
      """WITH obs AS (
        |  SELECT event_type,
        |         CAST(json_extract(props, '$.k') AS BIGINT) % 8 AS kb,
        |         COUNT(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
        |ct AS (SELECT kb, SUM(o) AS c FROM obs GROUP BY 1),
        |nt AS (SELECT SUM(o) AS ntot FROM obs),
        |cells AS (
        |  SELECT rt.event_type, ct.kb, COALESCE(obs.o, 0) AS o,
        |         rt.r, ct.c, nt.ntot
        |  FROM rt CROSS JOIN ct CROSS JOIN nt
        |  LEFT JOIN obs ON obs.event_type = rt.event_type
        |               AND obs.kb = ct.kb),
        |contrib AS (
        |  SELECT ROUND(
        |    CAST(CAST(o AS HUGEINT) * ntot - CAST(r AS HUGEINT) * c
        |         AS DOUBLE)
        |    * CAST(CAST(o AS HUGEINT) * ntot - CAST(r AS HUGEINT) * c
        |           AS DOUBLE)
        |    / CAST(CAST(ntot AS HUGEINT) * r * c AS DOUBLE), 6) AS tt
        |  FROM cells)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        |       CAST(SUM(CAST(tt AS DECIMAL(38,6))) AS DOUBLE) AS chi2
        |FROM contrib""".stripMargin,

    "q169_iqr_outliers" ->
      """WITH spend AS (
        |  SELECT c.c_mktsegment AS seg, o.o_custkey,
        |         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS c
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |n AS (SELECT seg, COUNT(*) AS n FROM spend GROUP BY 1),
        |h AS (SELECT seg, c, COUNT(*) AS cnt FROM spend GROUP BY 1, 2),
        |cum AS (
        |  SELECT seg, c, cnt,
        |         SUM(cnt) OVER (PARTITION BY seg ORDER BY c) AS cc
        |  FROM h),
        |q AS (
        |  SELECT cum.seg,
        |    MIN(CASE WHEN cc >= (n.n + 3) // 4 THEN c END) AS q1_cents,
        |    MIN(CASE WHEN cc >= (3 * n.n + 3) // 4 THEN c END) AS q3_cents
        |  FROM cum JOIN n ON n.seg = cum.seg GROUP BY 1),
        |f AS (
        |  SELECT seg, q1_cents, q3_cents,
        |         q1_cents - 3 * (q3_cents - q1_cents) // 2 AS lo,
        |         q3_cents + 3 * (q3_cents - q1_cents) // 2 AS hi
        |  FROM q)
        |SELECT spend.seg, CAST(MAX(f.q1_cents) AS BIGINT) AS q1_cents,
        |       CAST(MAX(f.q3_cents) AS BIGINT) AS q3_cents,
        |       CAST(SUM(CASE WHEN spend.c < f.lo OR spend.c > f.hi
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       COUNT(*) AS n_cust
        |FROM spend JOIN f ON f.seg = spend.seg
        |GROUP BY 1 ORDER BY spend.seg ASC NULLS FIRST""".stripMargin,

    // integer 2·rank moments in HUGEINT — the ÷4s cancel in the rho
    // formula, so both engines divide/sqrt the SAME exact integers
    "q170_spearman" ->
      """WITH v AS (
        |  SELECT l_returnflag AS g,
        |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x,
        |         CAST(l_quantity AS BIGINT) AS y
        |  FROM lineitem),
        |hx AS (SELECT g, x, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
        |rx AS (
        |  SELECT g, x,
        |    2 * (SUM(cnt) OVER (PARTITION BY g ORDER BY x) - cnt)
        |      + cnt + 1 AS r2x
        |  FROM hx),
        |hy AS (SELECT g, y, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
        |ry AS (
        |  SELECT g, y,
        |    2 * (SUM(cnt) OVER (PARTITION BY g ORDER BY y) - cnt)
        |      + cnt + 1 AS r2y
        |  FROM hy),
        |r AS (
        |  SELECT v.g, r2x, r2y
        |  FROM v JOIN rx ON rx.g = v.g AND rx.x = v.x
        |         JOIN ry ON ry.g = v.g AND ry.y = v.y),
        |m AS (
        |  SELECT g, COUNT(*) AS n,
        |         SUM(CAST(r2x AS HUGEINT)) AS s2x,
        |         SUM(CAST(r2y AS HUGEINT)) AS s2y,
        |         SUM(CAST(r2x AS HUGEINT) * r2y) AS s4xy,
        |         SUM(CAST(r2x AS HUGEINT) * r2x) AS s4xx,
        |         SUM(CAST(r2y AS HUGEINT) * r2y) AS s4yy
        |  FROM r GROUP BY 1)
        |SELECT g AS l_returnflag, n,
        |  ROUND(CAST(n * s4xy - s2x * s2y AS DOUBLE)
        |    / (SQRT(CAST(n * s4xx - s2x * s2x AS DOUBLE))
        |       * SQRT(CAST(n * s4yy - s2y * s2y AS DOUBLE))), 6) AS rho6
        |FROM m ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "q173_ks_test" ->
      """WITH v AS (
        |  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
        |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS grp
        |  FROM lineitem),
        |h AS (
        |  SELECT c, SUM(grp) AS a1, SUM(1 - grp) AS a0
        |  FROM v GROUP BY 1),
        |n AS (SELECT SUM(a1) AS n1, SUM(a0) AS n0 FROM h),
        |cum AS (
        |  SELECT c, SUM(a1) OVER (ORDER BY c) AS c1,
        |         SUM(a0) OVER (ORDER BY c) AS c0
        |  FROM h)
        |SELECT COUNT(*) AS n_values,
        |  ROUND(MAX(ABS(CAST(c1 AS DOUBLE) / n.n1
        |    - CAST(c0 AS DOUBLE) / n.n0)), 6) AS ks6
        |FROM cum CROSS JOIN n""".stripMargin,

    "q175_psi" ->
      """WITH o AS (
        |  SELECT CASE WHEN year(CAST(o_orderdate AS DATE)) < 1998
        |              THEN 0 ELSE 1 END AS per,
        |         LEAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
        |               // 5000000, 9) AS bin
        |  FROM orders),
        |h AS (
        |  SELECT bin, SUM(CASE WHEN per = 0 THEN 1 ELSE 0 END) AS a,
        |         SUM(CASE WHEN per = 1 THEN 1 ELSE 0 END) AS b
        |  FROM o GROUP BY 1),
        |n AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM h),
        |c AS (
        |  SELECT ROUND((CAST(a AS DOUBLE) / na - CAST(b AS DOUBLE) / nb)
        |    * LN((CAST(a AS DOUBLE) / na) / (CAST(b AS DOUBLE) / nb)), 8)
        |    AS contrib
        |  FROM h CROSS JOIN n WHERE a > 0 AND b > 0)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
        |       CAST(SUM(CAST(contrib AS DECIMAL(38,8))) AS DOUBLE) AS psi
        |FROM c""".stripMargin,

    // DECIMAL(18,6) so the square stays inside DuckDB's exact decimal
    // width (18+18+1 = 37 ≤ 38) — both engines sum the exact rationals
    // and cast to double once
    "q185_welch_t" ->
      """WITH v AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g,
        |         CAST(l_discount AS DECIMAL(18,6)) AS x
        |  FROM lineitem),
        |m AS (
        |  SELECT g, COUNT(*) AS n, SUM(x) AS sx, SUM(x*x) AS sxx
        |  FROM v GROUP BY 1),
        |s AS (
        |  SELECT
        |    MAX(CASE WHEN g=1 THEN n END) AS n1,
        |    MAX(CASE WHEN g=0 THEN n END) AS n0,
        |    MAX(CASE WHEN g=1 THEN CAST(sx AS DOUBLE) END) AS sx1,
        |    MAX(CASE WHEN g=0 THEN CAST(sx AS DOUBLE) END) AS sx0,
        |    MAX(CASE WHEN g=1 THEN CAST(sxx AS DOUBLE) END) AS sxx1,
        |    MAX(CASE WHEN g=0 THEN CAST(sxx AS DOUBLE) END) AS sxx0
        |  FROM m),
        |c AS (
        |  SELECT n1, n0,
        |    sx1/n1 - sx0/n0 AS md,
        |    (sxx1 - sx1*sx1/n1) / (n1-1) / n1 AS a,
        |    (sxx0 - sx0*sx0/n0) / (n0-1) / n0 AS b
        |  FROM s)
        |SELECT n1, n0,
        |  ROUND(md / SQRT(a + b), 4) AS t4,
        |  ROUND((a+b)*(a+b) / (a*a/(n1-1) + b*b/(n0-1)), 2) AS df2
        |FROM c""".stripMargin,

    "q186_mannwhitney" ->
      """WITH v AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g,
        |         CAST(l_quantity AS BIGINT) AS x
        |  FROM lineitem),
        |h AS (SELECT x, SUM(g) AS c1, SUM(1-g) AS c0 FROM v GROUP BY 1),
        |r AS (
        |  SELECT x, c1, c0, c1 + c0 AS t,
        |    2 * (SUM(c1 + c0) OVER (ORDER BY x) - (c1 + c0))
        |      + (c1 + c0) + 1 AS r2
        |  FROM h),
        |agg AS (
        |  SELECT
        |    (SELECT SUM(c1) FROM h) AS n1, (SELECT SUM(c0) FROM h) AS n0,
        |    SUM(CAST(c1 AS HUGEINT) * r2) AS s2,
        |    SUM(CAST(t AS HUGEINT) * t * t - t) AS tie3
        |  FROM r),
        |c AS (
        |  SELECT n1, n0, n1 + n0 AS n,
        |    CAST(s2 - n1 * CAST(n1 + 1 AS HUGEINT) AS HUGEINT) AS u2,
        |    CAST(n1 AS DOUBLE) * n0 / 12.0 *
        |      ((n1 + n0 + 1) - CAST(tie3 AS DOUBLE)
        |        / ((n1 + n0) * CAST(n1 + n0 - 1 AS DOUBLE))) AS var_u
        |  FROM agg)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
        |  CAST(u2 AS BIGINT) AS u2x,
        |  ROUND((CAST(u2 AS DOUBLE) / 2.0
        |         - CAST(n1 AS DOUBLE) * n0 / 2.0) / SQRT(var_u), 4) AS z4
        |FROM c""".stripMargin,

    // the OLS replay: exact DECIMAL(19,6) moment staging (width 19
    // forces DuckDB's int128 multiply — width 18 overflows int64 on
    // price×price; products are <= 4dp, exact at the (38,12) result),
    // then the SAME formula strings the Spark side runs through
    // expr() — one definition, two engines
    "q254_ols_pricing" ->
      s"""WITH v AS (
         |  SELECT l_returnflag,
         |         CAST(l_quantity AS DECIMAL(19,6)) AS q,
         |         CAST(l_discount AS DECIMAL(19,6)) AS d,
         |         CAST(l_extendedprice AS DECIMAL(19,6)) AS y
         |  FROM lineitem),
         |m AS (
         |  SELECT l_returnflag, COUNT(*) AS cnt,
         |         SUM(q) AS m_sq, SUM(d) AS m_sd, SUM(y) AS m_sy,
         |         SUM(q*q) AS m_sqq, SUM(q*d) AS m_sqd,
         |         SUM(d*d) AS m_sdd, SUM(q*y) AS m_sqy,
         |         SUM(d*y) AS m_sdy, SUM(y*y) AS m_syy
         |  FROM v GROUP BY 1),
         |s AS (
         |  SELECT l_returnflag, CAST(cnt AS BIGINT) AS n_rows,
         |         CAST(cnt AS DOUBLE) AS n,
         |         CAST(m_sq AS DOUBLE) AS sq, CAST(m_sd AS DOUBLE) AS sd,
         |         CAST(m_sy AS DOUBLE) AS sy, CAST(m_sqq AS DOUBLE) AS sqq,
         |         CAST(m_sqd AS DOUBLE) AS sqd, CAST(m_sdd AS DOUBLE) AS sdd,
         |         CAST(m_sqy AS DOUBLE) AS sqy, CAST(m_sdy AS DOUBLE) AS sdy,
         |         CAST(m_syy AS DOUBLE) AS syy
         |  FROM m)
         |SELECT l_returnflag, n_rows,
         |       ${OlsFormula.b0Out} AS b0_6,
         |       ${OlsFormula.bqOut} AS b_qty_6,
         |       ${OlsFormula.bdOut} AS b_disc_6,
         |       ${OlsFormula.r2Out} AS r2_6
         |FROM s
         |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "q202_winsorize" ->
      """WITH hist AS (
        |  SELECT l_returnflag AS f, l_extendedprice AS v, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT f, v, cnt,
        |    SUM(cnt) OVER (PARTITION BY f ORDER BY v) AS cum,
        |    SUM(cnt) OVER (PARTITION BY f) AS n
        |  FROM hist),
        |b AS (
        |  SELECT f,
        |    MIN(CASE WHEN cum * 20 >= n THEN v END) AS p05,
        |    MIN(CASE WHEN cum * 20 >= n * 19 THEN v END) AS p95
        |  FROM c GROUP BY f)
        |SELECT l_returnflag, COUNT(*) AS n_lines, p05, p95,
        |  ROUND(CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, p05), p95)
        |    AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 4) AS win_mean,
        |  COUNT(CASE WHEN l_extendedprice BETWEEN p05 AND p95 THEN 1 END)
        |    AS n_kept,
        |  ROUND(CAST(SUM(CASE WHEN l_extendedprice BETWEEN p05 AND p95
        |    THEN CAST(l_extendedprice AS DECIMAL(38,6)) END) AS DOUBLE)
        |    / COUNT(CASE WHEN l_extendedprice BETWEEN p05 AND p95 THEN 1 END),
        |    4) AS trim_mean
        |FROM lineitem JOIN b ON l_returnflag = f
        |GROUP BY l_returnflag, p05, p95
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    // the rank replay: same cents grid, window cumsum for the 2·avg-
    // rank integers, HUGEINT staging for the exact rank sums, the
    // SAME KwFormula strings, [D5] integer-staged mean rank
    "q328_kruskal_wallis" ->
      s"""WITH v AS (
         |  SELECT o_orderpriority AS g,
         |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
         |  FROM orders),
         |cells AS (SELECT g, x, COUNT(*) AS c FROM v GROUP BY 1, 2),
         |hx AS (SELECT x, SUM(c) AS t FROM cells GROUP BY 1),
         |r AS (
         |  SELECT x, 2 * (SUM(t) OVER (ORDER BY x) - t) + t + 1 AS r2
         |  FROM hx),
         |per AS (
         |  SELECT g, SUM(c) AS nj, SUM(CAST(c AS HUGEINT) * r2) AS s2j
         |  FROM cells JOIN r USING (x) GROUP BY g),
         |ties AS (
         |  SELECT SUM(CAST(t AS HUGEINT) * t * t - t) AS tie3 FROM hx),
         |gm AS (
         |  SELECT SUM(nj) AS nn,
         |         SUM(CAST(round(CAST(s2j AS DOUBLE) * CAST(s2j AS DOUBLE)
         |           / CAST(nj AS DOUBLE), 6) AS DECIMAL(38,6))) AS sq
         |  FROM per),
         |stat AS (
         |  SELECT CAST(nn AS BIGINT) AS n_total,
         |         ${KwFormula.h4} AS h4, ${KwFormula.hc4} AS hc4
         |  FROM gm, ties)
         |SELECT g AS priority, CAST(nj AS BIGINT) AS n_orders,
         |       CAST((2 * s2j * 10000 + 2 * nj) // (4 * nj) AS DOUBLE)
         |         / 10000.0 AS mean_rank4,
         |       n_total, h4, hc4
         |FROM per, stat
         |ORDER BY priority ASC NULLS FIRST""".stripMargin,

    // the deviation replay: q44-style histogram median per group,
    // exact integer |x − med|, HUGEINT moment staging, the SAME
    // BfFormula string, [D5] integer-staged mean deviation
    "q331_brown_forsythe" ->
      s"""WITH li AS (
         |  SELECT l_returnflag AS g,
         |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x
         |  FROM lineitem),
         |hist AS (SELECT g, x, COUNT(*) AS cnt FROM li GROUP BY 1, 2),
         |cum AS (
         |  SELECT g, x,
         |         SUM(cnt) OVER (PARTITION BY g ORDER BY x) AS cum,
         |         SUM(cnt) OVER (PARTITION BY g) AS n
         |  FROM hist),
         |med AS (
         |  SELECT g, MIN(CASE WHEN cum >= (n + 1) // 2 THEN x END) AS med
         |  FROM cum GROUP BY g),
         |z AS (
         |  SELECT li.g AS g, ABS(x - med) AS z
         |  FROM li JOIN med ON li.g = med.g),
         |per AS (
         |  SELECT g, COUNT(*) AS nj, SUM(z) AS sj,
         |         SUM(CAST(z AS HUGEINT) * z) AS qj
         |  FROM z GROUP BY g),
         |gm AS (
         |  SELECT COUNT(*) AS k, SUM(nj) AS nn, SUM(sj) AS ss,
         |         SUM(CAST(round(CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE)
         |           / CAST(nj AS DOUBLE), 6) AS DECIMAL(38,6))) AS bb,
         |         SUM(CAST(qj AS DECIMAL(38,6))) AS qq
         |  FROM per),
         |stat AS (
         |  SELECT CAST(k AS BIGINT) AS n_groups, ${BfFormula.f4} AS f4
         |  FROM gm)
         |SELECT per.g AS flag, CAST(nj AS BIGINT) AS n_lines,
         |       med AS med_cents,
         |       CAST((2 * CAST(sj AS HUGEINT) * 10000 + nj) // (2 * nj)
         |         AS DOUBLE) / 10000.0 AS mean_absdev4,
         |       n_groups, f4
         |FROM per JOIN med ON per.g = med.g, stat
         |ORDER BY flag ASC NULLS FIRST""".stripMargin,

    // the weekday replay: same epoch-day mod 7 grouping, HUGEINT
    // moments, the SAME BfFormula, [D5] integer-staged means
    "q357_weekday_anova" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us,
         |         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS z
         |  FROM orders GROUP BY 1),
         |v AS (SELECT (day_us // 86400000000) % 7 AS dow, z FROM daily),
         |per AS (
         |  SELECT dow, COUNT(*) AS nj, SUM(z) AS sj,
         |         SUM(CAST(z AS HUGEINT) * z) AS qj
         |  FROM v GROUP BY 1),
         |gm AS (
         |  SELECT COUNT(*) AS k, SUM(nj) AS nn, SUM(sj) AS ss,
         |         SUM(CAST(round(CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE)
         |           / CAST(nj AS DOUBLE), 6) AS DECIMAL(38,6))) AS bb,
         |         SUM(CAST(qj AS DECIMAL(38,6))) AS qq
         |  FROM per),
         |stat AS (
         |  SELECT CAST(k AS BIGINT) AS n_groups, ${BfFormula.f4} AS f4
         |  FROM gm)
         |SELECT CAST(dow AS BIGINT) AS dow, CAST(nj AS BIGINT) AS n_days,
         |       CAST((2 * CAST(sj AS HUGEINT) * 10000 + nj) // (2 * nj)
         |         AS DOUBLE) / 10000.0 AS mean_cents4,
         |       n_groups, f4
         |FROM per, stat
         |ORDER BY dow ASC NULLS FIRST""".stripMargin,

    // the paradox replay: same moment pass, HUGEINT staging, the SAME
    // SlopeFormula on both the strata and the pooled row, flip from
    // the rounded slopes
    "q344_simpson_flip" ->
      s"""WITH v AS (
         |  SELECT l_returnflag AS g,
         |         CAST(l_quantity AS BIGINT) AS x,
         |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
         |  FROM lineitem),
         |per AS (
         |  SELECT g, COUNT(*) AS nn, SUM(x) AS sx, SUM(y) AS sy,
         |         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |         SUM(CAST(x AS HUGEINT) * y) AS sxy
         |  FROM v GROUP BY 1),
         |pl AS (
         |  SELECT SUM(nn) AS nn, SUM(sx) AS sx, SUM(sy) AS sy,
         |         SUM(sxx) AS sxx, SUM(sxy) AS sxy
         |  FROM per),
         |ps AS (SELECT ${SlopeFormula.slope4} AS pooled_slope4 FROM pl)
         |SELECT g AS flag, CAST(nn AS BIGINT) AS n_lines,
         |       ${SlopeFormula.slope4} AS slope4, pooled_slope4,
         |       CAST(CASE WHEN ${SlopeFormula.slope4} * pooled_slope4 < 0
         |            THEN 1 ELSE 0 END AS BIGINT) AS flip
         |FROM per, ps
         |ORDER BY flag ASC NULLS FIRST""".stripMargin,

    // the dispersion replay: same daily histogram, HUGEINT moment
    // staging, the SAME DispFormula trees, [D5] integer-staged mean
    "q335_overdispersion" ->
      s"""WITH daily AS (
         |  SELECT date_trunc('day', ts) AS day, COUNT(*) AS c
         |  FROM events GROUP BY 1),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         |         CAST(SUM(c) AS BIGINT) AS s1,
         |         SUM(CAST(c AS HUGEINT) * c) AS s2
         |  FROM daily)
         |SELECT n_days, s1 AS n_events,
         |       CAST((2 * s1 * 10000 + n_days) // (2 * n_days) AS DOUBLE)
         |         / 10000.0 AS mean4,
         |       ${DispFormula.disp4} AS disp4,
         |       ${DispFormula.chi4} AS chi4
         |FROM m""".stripMargin
  )
}
