package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: rounds-to-fixpoint and core sizes of the k-core peel on
  * the w ≥ 2 co-purchase backbone, per scale factor — pins the oracle's
  * unroll depth for q238. `runMain graft.tools.KCoreProbe [k]`. */
object KCoreProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").foreach { dir =>
      val und = graft.operators.CoPurchase.pairW(spark, dir)
        .filter(col("w") >= 2).select("x", "y")
        .localCheckpoint(true)
      var e = und
      var r = 0
      var done = false
      while (!done && r < 50) {
        val drop = e.select(col("x").as("u"))
          .unionAll(e.select(col("y").as("u")))
          .groupBy("u").agg(count(lit(1)).as("d"))
          .filter(col("d") < k).select("u").localCheckpoint(true)
        if (drop.isEmpty) done = true
        else {
          e = e.join(drop.select(col("u").as("x")), Seq("x"), "left_anti")
            .join(drop.select(col("u").as("y")), Seq("y"), "left_anti")
            .localCheckpoint(true)
          r += 1
        }
      }
      val nv = e.select(col("x").as("v")).unionAll(e.select(col("y").as("v")))
        .distinct().count()
      println(s"PROBE $dir k=$k rounds=$r core_vertices=$nv " +
        s"core_edges=${e.count()} input_edges=${und.count()}")
    }
    spark.stop()
  }
}
