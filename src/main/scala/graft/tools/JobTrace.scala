package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev probe: per-job wall-clock trace for one shared prime / query —
  * names each Spark job with its duration and first stage callsite so
  * the fixed-cost budget of a multi-job build is readable.
  * `runMain graft.tools.JobTrace <sfDir> <label|qkey>` */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.queries("q20_agg_pricing")(s, dir).count()
    catch { case _: Throwable => }
    val starts = mutable.Map[Int, (Long, String)]()
    val lines = mutable.ArrayBuffer[String]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.headOption.map(_.details.split("\n")
          .find(l => l.contains("graft") && !l.contains("JobTrace"))
          .getOrElse(j.stageInfos.head.name)).getOrElse("?")
        starts(j.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          lines += f"[job] ${j.jobId}%4d ${(System.nanoTime - t0) / 1e9}%7.2f s  $site"
        }
    })
    val t0 = System.nanoTime()
    if (name.startsWith("shared:"))
      graft.SharedMemos.primes(dir).toMap.apply(name)(s)
    else graft.SparkEntry.queries(name)(s, dir).count()
    val total = (System.nanoTime - t0) / 1e9
    Thread.sleep(500)
    lines.foreach(println)
    println(f"[jobtrace] $name total $total%.2f s, ${lines.size} jobs")
    s.stop()
  }
}
