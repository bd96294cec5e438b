package graft.tools

/** Dev probe: fixed cost of Tables.load + plan instantiation, repeated.
  * `runMain graft.tools.LoadProbe <sfDir>` */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q20_agg_pricing")(s, dir).count()
    def bench(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[loadprobe] $label%-34s ${(System.nanoTime - t0) / 1e9}%.3f s")
    }
    bench("100x load only")(
      (1 to 100).foreach(_ => graft.Tables.load(s, dir, "lineitem")))
    bench("100x load+analyzed")(
      (1 to 100).foreach(_ =>
        graft.Tables.load(s, dir, "lineitem").queryExecution.analyzed))
    bench("100x load+executedPlan")(
      (1 to 100).foreach(_ =>
        graft.Tables.load(s, dir, "lineitem").queryExecution.executedPlan))
    bench("100x loadSpread documents")(
      (1 to 100).foreach(_ => graft.Tables.loadSpread(s, dir, "documents")))
    bench("30x count lineitem")(
      (1 to 30).foreach(_ => graft.Tables.load(s, dir, "lineitem").count()))
    s.stop()
  }
}
