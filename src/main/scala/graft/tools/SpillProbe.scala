package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev probe (r15, verdict item 8): runs one declared key or shared
  * prime and reports per-stage spill / peak-execution-memory / shuffle
  * volumes from the task metrics — the evidence a "this aggregation
  * will (not) spill at scale" claim needs.
  * `runMain graft.tools.SpillProbe <sfDir> <label|qkey>` */
object SpillProbe {
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
    case class Agg(var memSpill: Long = 0L, var diskSpill: Long = 0L,
      var peak: Long = 0L, var shufRead: Long = 0L, var shufWrite: Long = 0L,
      var tasks: Int = 0)
    val stages = mutable.Map[Int, (String, Agg)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        val site = e.stageInfo.details.split("\n")
          .find(l => l.contains("graft") && !l.contains("SpillProbe"))
          .getOrElse(e.stageInfo.name)
        stages(e.stageInfo.stageId) = (site, Agg())
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) stages.get(e.stageId).foreach { case (_, a) =>
          a.memSpill += m.memoryBytesSpilled
          a.diskSpill += m.diskBytesSpilled
          a.peak = math.max(a.peak, m.peakExecutionMemory)
          a.shufRead += m.shuffleReadMetrics.totalBytesRead
          a.shufWrite += m.shuffleWriteMetrics.bytesWritten
          a.tasks += 1
        }
      }
    })
    val t0 = System.nanoTime()
    if (name.startsWith("shared:"))
      graft.SharedMemos.primes(dir).toMap.apply(name)(s)
    else graft.SparkEntry.queries(name)(s, dir).count()
    val total = (System.nanoTime - t0) / 1e9
    Thread.sleep(500)
    def mb(v: Long): String = f"${v / 1048576.0}%.1f"
    val rows = stages.toSeq.sortBy(_._1)
    rows.foreach { case (id, (site, a)) =>
      if (a.tasks > 0)
        println(f"[stage] $id%4d tasks=${a.tasks}%3d " +
          f"spillMem=${mb(a.memSpill)}%8s MB spillDisk=${mb(a.diskSpill)}%8s MB " +
          f"peakExec=${mb(a.peak)}%8s MB shufR=${mb(a.shufRead)}%8s MB " +
          f"shufW=${mb(a.shufWrite)}%8s MB  $site")
    }
    val tm = rows.map(_._2._2.memSpill).sum
    val td = rows.map(_._2._2.diskSpill).sum
    val pk = (rows.map(_._2._2.peak) :+ 0L).max
    println(f"[spillprobe] $name total $total%.2f s, stages=${rows.size}, " +
      f"spillMem=${mb(tm)} MB, spillDisk=${mb(td)} MB, maxPeakExec=${mb(pk)} MB")
    s.stop()
  }
}
