package graft.tools

import graft.operators.CoPurchase
import org.apache.spark.sql.functions._

/** Dev probe: phase timing of the cf_neighbors build.
  * `runMain graft.tools.CfProbe <sfDir>` */
object CfProbe {
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
      println(f"[cfprobe] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    time("pairW")(CoPurchase.pairW(s, dir).count())
    val und = CoPurchase.pairW(s, dir).filter(col("w") >= 2L)
    time("backbone count")(println("  bb=" + und.count()))
    val ed = und.select(col("x").as("u"), col("y").as("v"), col("w"))
      .unionAll(und.select(col("y").as("u"), col("x").as("v"), col("w")))
    val sdeg = ed.groupBy("u").agg(sum(col("w")).as("s"))
    time("sdeg count")(println("  sdeg=" + sdeg.count()))
    val e1 = ed.select(col("u"), col("v").as("px"), col("w").as("wx"))
    val e2 = ed.select(col("u"), col("v").as("py"), col("w").as("wy"))
    val sc0 = e1.join(e2, Seq("u")).filter(col("px") < col("py"))
      .select(col("px"), col("py"), least(col("wx"), col("wy")).as("m"))
      .groupBy("px", "py")
      .agg(sum(col("m")).as("cmin"))
    time("cmin count")(println("  cmin=" + sc0.count()))
    val sc = sc0
      .join(sdeg.select(col("u").as("px"), col("s").as("sx")), Seq("px"))
      .join(sdeg.select(col("u").as("py"), col("s").as("sy")), Seq("py"))
      .withColumn("d", col("sx") + col("sy") - col("cmin"))
      .select(col("px"), col("py"),
        expr("(2L * cmin * 10000L + d) div (2L * d)").as("wjac_bp"))
    time("sc count")(println("  sc=" + sc.count()))
    val both = sc.select(col("px").as("item"), col("py").as("rec"),
        col("wjac_bp"))
      .unionAll(sc.select(col("py").as("item"), col("px").as("rec"),
        col("wjac_bp")))
    val top = graft.plans.GraftOps.topKPerGroup(both, Seq(col("item")),
        Seq(col("wjac_bp").desc, col("rec").asc), 10, rankName = "__rn")
      .select("item", "rec", "wjac_bp")
    time("topK count")(println("  top=" + top.count()))
    time("full memo build")(
      graft.operators.GraphQueries.cfNeighbors(s, dir).count())
    s.stop()
  }
}
