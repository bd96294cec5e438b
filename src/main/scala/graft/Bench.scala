package graft
object Bench {
  def main(args: Array[String]): Unit = {
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
    // full-name map overflows it and the line arrives unparseable
    // (BENCH_r02 `parsed: null`). Short keys ("q44" for
    // "q44_median_disc" — the numeric id is unique) plus 3-decimal
    // values keep the whole line ~1.4 KB, well inside the window.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def shortKey(k: String): String = k.takeWhile(_ != '_')
    val qs = results.map { case (k, v) => "\"" + shortKey(k) + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // escape the interpolated path — a quote or backslash in the env
    // var would otherwise break the one JSON line the driver parses
    val sfEsc = sfDir.replace("\\", "\\\\").replace("\"", "\\\"")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfEsc"}""")
    graft.operators.TextQueries.clearCaches(spark)
    spark.stop()
  }
}
