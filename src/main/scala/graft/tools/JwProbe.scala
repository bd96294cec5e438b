package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q205 stage cost breakdown (candidate join alone, + kernel,
  * + round, full). `runMain graft.tools.JwProbe [sfDir]`. */
object JwProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    val p = graft.Tables.loadSpread(s, dir, "part")
      .select("p_partkey", "p_brand", "p_name")
    val band = floor(length(col("p_name")) / 4).cast("int")
    def cand = {
      val a = p.select(col("p_brand"), band.as("band"),
        col("p_partkey").as("id_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand"),
        explode(array(band - 1, band, band + 1)).as("band"),
        col("p_partkey").as("id_b"), col("p_name").as("name_b"))
      a.join(b, Seq("p_brand", "band"))
        .filter(col("id_a") < col("id_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= 2)
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[jwprobe] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s ($c rows)")
    }
    // warmup
    cand.count()
    time("candidates only")(cand.count())
    time("cand + jw kernel")(cand
      .filter(expr("graft_jaro_winkler(name_a, name_b)") >= 0.94).count())
    time("cand + jw + round")(cand
      .filter(round(expr("graft_jaro_winkler(name_a, name_b)"), 4) >= 0.94)
      .count())
    time("full q205 (fresh build)")(graft.operators.JoinQueries
      .queries("q205_jaro_winkler")(s, dir).count())
    s.stop()
  }
}
