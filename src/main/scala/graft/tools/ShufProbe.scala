package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: fixed-cost microbenchmarks — what does one tiny shuffle
  * cost in this environment? `runMain graft.tools.ShufProbe <sfDir>` */
object ShufProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[shufprobe] $label%-30s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    time("warmup q20")(
      graft.SparkEntry.queries("q20_agg_pricing")(s, dir).count())
    time("range scan 1e6")(s.range(1000000L).count())
    for (i <- 1 to 3)
      time(s"range groupBy shuffle #$i")(
        s.range(1000000L).groupBy(pmod(col("id"), lit(97))).count().count())
    time("pairW build")(graft.operators.CoPurchase.pairW(s, dir).count())
    for (i <- 1 to 3)
      time(s"pairW cached scan #$i")(
        graft.operators.CoPurchase.pairW(s, dir).count())
    for (i <- 1 to 3)
      time(s"pairW cached groupBy #$i")(
        graft.operators.CoPurchase.pairW(s, dir)
          .groupBy("x").agg(sum("w")).count())
    for (i <- 1 to 3)
      time(s"backbone groupBy #$i")(
        graft.operators.CoPurchase.pairW(s, dir).filter(col("w") >= 2L)
          .groupBy("x").agg(sum("w")).count())
    s.stop()
  }
}
