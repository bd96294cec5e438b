package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: where does the triangle census spend time, and what does
  * the closing-join strategy change? `runMain graft.tools.TriProbe <sfDir>` */
object TriProbe {
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
      println(f"[triprobe] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    val und = time("pairW build")(
      graft.operators.CoPurchase.und(s, dir).localCheckpoint(true))
    val u = und.select(col("x"), col("y"))
    val deg = time("degrees")(graft.api.GraphOps.degrees(u, "x", "y")
      .localCheckpoint(true))
    val ed = time("orient")(u
      .join(deg.select(col("v").as("x"), col("d").as("dx")), Seq("x"))
      .join(deg.select(col("v").as("y"), col("d").as("dy")), Seq("y"))
      .select(
        when(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")), col("x"))
          .otherwise(col("y")).as("src"),
        when(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")), col("y"))
          .otherwise(col("x")).as("dst"))
      .localCheckpoint(true))
    val dd = deg.select(col("v").as("dst"), col("d").as("ddst"))
    val eo = time("eo join")(ed.join(dd, Seq("dst")).localCheckpoint(true))
    val w1 = eo.select(col("src"), col("dst").as("w1"), col("ddst").as("d1"))
    val w2 = eo.select(col("src"), col("dst").as("w2"), col("ddst").as("d2"))
    def wedges = w1.join(w2, Seq("src"))
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("w1") < col("w2")))
    time("wedge count only")(println("  wedges=" + wedges.count()))
    val closing = ed.select(col("src").as("w1"), col("dst").as("w2"))
    time("close SMJ (current)")(println("  tri=" +
      wedges.join(closing, Seq("w1", "w2")).count()))
    time("close SHJ hint")(println("  tri=" +
      wedges.join(closing.hint("shuffle_hash"), Seq("w1", "w2")).count()))
    time("close broadcast")(println("  tri=" +
      wedges.join(broadcast(closing), Seq("w1", "w2")).count()))
    time("close SMJ again")(println("  tri=" +
      wedges.join(closing, Seq("w1", "w2")).count()))
    s.stop()
  }
}
