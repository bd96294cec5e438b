package graft
object Bench {

  /** First three fields of /proc/loadavg (1/5/15-min run-queue), or
    * NaNs off-Linux — lets a reader machine-detect a load-polluted run
    * (three rounds of recorded benches were dominated by box load). */
  private def loadavg(): Seq[Double] =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+").take(3).toSeq.map(_.toDouble)
    catch { case _: Throwable => Seq(Double.NaN, Double.NaN, Double.NaN) }

  @volatile private var calibSink = 0L

  /** Fixed single-threaded integer work (~tens of ms idle): wall time
    * scales with CPU contention, so calib_ms_pre/post calibrate the
    * box's state independent of any Spark plan. */
  private def calibMs(): Double = {
    val t0 = System.nanoTime()
    var x = 0L
    var i = 0
    while (i < 50000000) { x += (x ^ i) * 2654435761L + i; i += 1 }
    calibSink = x
    (System.nanoTime() - t0) / 1e6
  }

  def main(args: Array[String]): Unit = {
    val loadPre = loadavg()
    val calibPre = calibMs()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GraftSession also pins the UTC session timezone — without it a
    // non-UTC box would plan different timestamp predicate boundaries
    // than the verified runs and benchmark a different workload
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT, codegen cache, parquet footer reads — otherwise
    // ~5s of one-time JVM cost lands on whichever query happens to run
    // first and distorts its number.
    SparkEntry.queries.get("q20_agg_pricing").foreach { f =>
      try f(spark, sfDir).count() catch { case _: Throwable => }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must read as -1, not as its time-to-failure —
      // otherwise a regression that throws early looks like a speedup
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // The driver keeps only a ~3 KB tail of stdout; with 94 queries the
    // full-name map overflowed it and the line arrived unparseable
    // (BENCH_r02 `parsed: null`), and by 258 keys even the short-key map
    // was ~3.3 KB and clipped q01-q199 out of the captured artifact
    // (BENCH_r10). So the FULL per-query map (full names) goes to a
    // companion file and the inline line carries only the worst-N slice
    // (the lines a reader triages first) next to the totals + telemetry.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def shortKey(k: String): String = k.takeWhile(_ != '_')
    val qs = results.filter(_._2 >= 0).sortBy(-_._2).take(InlineWorstN)
      .map { case (k, v) => "\"" + shortKey(k) + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // escape the interpolated path — a quote or backslash in the env
    // var would otherwise break the one JSON line the driver parses
    val sfEsc = sfDir.replace("\\", "\\\\").replace("\"", "\\\"")
    // load/calibration telemetry so a load-polluted run is machine-
    // detectable next to the timings it polluted (idle box ≈ load1 ≪
    // nproc and calib_ms_pre ≈ calib_ms_post)
    val loadPost = loadavg()
    val calibPost = calibMs()
    def fl(v: Double): String =
      if (v.isNaN) "null" else "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // Pollution SELF-DEFENSE (round 10; detection alone was not enough —
    // BENCH_r09 shipped a 2x-inflated official total that the telemetry
    // flagged but could not correct): when the single-threaded
    // calibration drifted > 15% across the sweep, the box was contended
    // at some point, so re-measure the WORST-N lines once and emit both
    // timings. The re-run rides a second calibration (calib_ms_re) so a
    // reader can tell whether the re-measure itself ran idle; the
    // headline total also gets a "value_requeried" companion with the
    // re-measured lines substituted. Bounded: N queries, one run each.
    val drift = math.max(calibPre, calibPost) /
      math.max(1e-9, math.min(calibPre, calibPost))
    // GRAFT_BENCH_FORCE_REQUERY exercises the re-measure branch on an
    // idle box (used by the JSON smoke check; also a manual lever)
    val forced = sys.env.contains("GRAFT_BENCH_FORCE_REQUERY")
    val doRequery = forced || !(drift.isNaN || drift <= 1.15)
    // the re-measure must NOT ride the first pass's warm session caches
    // (memoized pair tables, persistTracked relations) — a cache-hit
    // timing would systematically understate a genuinely clean run, so
    // release the session's working set first; each re-measured query
    // then pays its own (re)build, an honest per-line upper bound
    if (doRequery) graft.operators.TextQueries.clearCaches(spark)
    val requeried: Seq[(String, Double)] =
      if (!doRequery) Seq.empty
      else results.filter(_._2 >= 0).sortBy(-_._2).take(10)
        .map { case (name, _) =>
          val t0 = System.nanoTime()
          val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
            catch { case _: Throwable => false }
          name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
        }
    val calibRe = if (requeried.isEmpty) Double.NaN else calibMs()
    val reJson =
      if (requeried.isEmpty) ""
      else {
        val m = requeried.map { case (k, v) =>
          "\"" + shortKey(k) + "\":" + f3(v)
        }.mkString("{", ",", "}")
        val reMap = requeried.toMap
        val totalRe = results.map { case (k, v) =>
          reMap.getOrElse(k, v)
        }.filter(_ >= 0).sum
        s""""requeried":$m,"calib_ms_re":${fl(calibRe)},""" +
          s""""value_requeried":${f3(totalRe)},"""
      }
    val tele = s""""loadavg_pre":[${loadPre.map(fl).mkString(",")}],""" +
      s""""loadavg_post":[${loadPost.map(fl).mkString(",")}],""" +
      s""""calib_ms_pre":${fl(calibPre)},"calib_ms_post":${fl(calibPost)}""" +
      s""",$reJson""".stripSuffix(",")
    // the companion artifact: the FULL per-query map under its full key
    // names (the inline line only carries the worst-N slice), plus the
    // same telemetry — written before the inline print so a teardown
    // failure cannot eat it
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "BENCH_DETAIL.json")
    try {
      val fullQs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath),
        s"""{"sf":"$sfEsc","n_queries":${results.size},""" +
          s""""queries":$fullQs,"unit":"sec",$tele,""" +
          s""""metric":"total","value":${f3(total)}}""" + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }
    // the one JSON line goes out LAST, after session teardown, so the
    // driver's bounded tail-capture of stdout cannot lose it behind
    // later output — but in a try/finally so a teardown failure can
    // never eat the headline metric. Telemetry sits AFTER the query
    // map, next to the total at the END of the line: the driver's
    // ~3 KB window keeps the tail and may clip the head (BENCH_r08
    // lost the loadavg fields when they led the line).
    try {
      graft.operators.TextQueries.clearCaches(spark)
      spark.stop()
    } finally {
      println(s"""{"sf":"$sfEsc","n_queries":${results.size},"queries_inline":"worst$InlineWorstN","detail_file":"$detailPath","queries":$qs,"unit":"sec",$tele,"metric":"total","value":${f3(total)}}""")
      System.out.flush()
    }
  }

  /** How many per-query lines ride the inline JSON (worst-first): 25
    * short keys ≈ 0.4 KB, leaving the driver's ~3 KB stdout tail ample
    * room for the totals + telemetry that must survive capture; the
    * full map lives in the `detail_file` companion. */
  private val InlineWorstN = 25
}
