package graft.tools

import graft.{SharedMemos, SparkEntry}

/** Dev tool: time individual shared-memo primes (and optionally query
  * keys) in isolation under the bench session config — the per-line
  * profiler for the optimization rounds. Labels match BENCH_DETAIL's
  * `shared:` lines. `runMain graft.tools.MemoTime <sfDir> <label|qkey>..`
  */
object MemoTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q20_agg_pricing")(s, dir).count()
    catch { case _: Throwable => }
    val primes = SharedMemos.primes(dir).toMap
    names.foreach { n =>
      val t0 = System.nanoTime()
      if (n.startsWith("shared:")) primes(n)(s)
      else SparkEntry.queries(n)(s, dir).count()
      println(f"[memotime] $n%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    graft.operators.TextQueries.clearCaches(s)
    s.stop()
  }
}
