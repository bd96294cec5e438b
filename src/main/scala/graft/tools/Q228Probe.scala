package graft.tools

import graft.operators.{CoPurchase, GraphQueries}
import org.apache.spark.sql.functions._

/** Dev probe: phase timing of q228's sampled wedge enumeration.
  * `runMain graft.tools.Q228Probe <sfDir>` */
object Q228Probe {
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
      println(f"[q228probe] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    time("pairW")(CoPurchase.pairW(s, dir).count())
    val und = CoPurchase.und(s, dir)
    val ed = CoPurchase.directedW(s, dir).select("u", "v")
    time("ed count")(println("  ed=" + ed.count()))
    val deg = ed.groupBy("u").agg(count(lit(1)).as("d"))
    time("deg count")(println("  deg=" + deg.count()))
    val invlog = deg.filter(col("d") >= 2).select(col("u"),
      round(lit(1d) / log(col("d").cast("double")), 6).as("il"))
    val apexIl = invlog.filter(
      pmod(GraphQueries.polyMix(pmod(col("u"), lit(2147483647L))),
        lit(32)) < lit(1))
    val nbr = ed.join(apexIl, Seq("u"))
      .groupBy(col("u"), col("il"))
      .agg(sort_array(collect_list(col("v"))).as("nb"))
    time("nbr count")(println("  nbr=" + nbr.count()))
    def fan = nbr
      .select(col("il"), explode(expr(
        "flatten(transform(nb, (x, i) -> " +
          "transform(slice(nb, i + 2, size(nb) - i - 1), " +
          "y -> struct(x AS px, y AS py))))")).as("p"))
      .select(col("p.px").as("px"), col("p.py").as("py"), col("il"))
    time("fan count")(println("  wedges=" + fan.count()))
    def scored = fan.groupBy("px", "py")
      .agg(count(lit(1)).as("cn_sampled"),
        sum(col("il").cast(graft.Dets.Dec)).as("aa_s"))
      .filter(col("cn_sampled") >= 2)
    time("scored count")(println("  pairs=" + scored.count()))
    def antiIn = scored.join(und.select(col("x").as("px"), col("y").as("py")),
      Seq("px", "py"), "left_anti")
    time("anti count")(println("  anti=" + antiIn.count()))
    time("full q228")(
      graft.SparkEntry.queries("q228_link_pred_sampled")(s, dir).count())
    time("full q228 again")(
      graft.SparkEntry.queries("q228_link_pred_sampled")(s, dir).count())
    s.stop()
  }
}
