package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual declared queries at a given SF with the
  * bench session config. `runMain graft.tools.QTime <sfDir> q.. q..` */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q20_agg_pricing")(s, dir).count()
    catch { case _: Throwable => }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(s, dir).count()
      println(f"[qtime] $n%-22s ${(System.nanoTime - t0) / 1e9}%.2f s ($c rows)")
    }
    s.stop()
  }
}
