package graft.tools

import graft.operators.TextQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: stage timings for the q111 prefix-filtered containment
  * join — where does the candidate pipeline spend its time at a given
  * SF? `runMain graft.tools.Q111Profile [sfDir]`.
  *
  * NOTE: the stages below are a deliberate inline copy of
  * [[graft.api.TextOps.containmentPairsPrefix]] (threshold 0.9, same
  * prefix-size arithmetic) so each can be timed in isolation — when
  * changing the operator, update this profiler to match or its
  * timings describe a stale pipeline. */
object Q111Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q111] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    val hashed = TextQueries.hashedDocs(s, dir)
    time("hashed build")(hashed.count())
    val posts = hashed.select(col("id"), col("block"),
      size(col("hs")).as("n"), explode(col("hs")).as("h")).persist()
    time("posts explode")(posts.count())
    val dfreq = posts.groupBy("block", "h").agg(count(lit(1)).as("df"))
      .persist()
    time("dfreq agg")(dfreq.count())
    val w = Window.partitionBy("id").orderBy(col("df").asc, col("h").asc)
    val prefix = posts.join(dfreq, Seq("block", "h"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <=
        col("n") - ceil(lit(0.9) * col("n") - lit(1e-9)) + lit(1))
      .select(col("id").as("id_x"), col("block"), col("h")).persist()
    time("prefix window")(println("  prefix rows: " + prefix.count()))
    val cand = prefix
      .join(posts.select(col("id").as("id_y"), col("block"), col("h")),
        Seq("block", "h"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_lo"),
        greatest(col("id_x"), col("id_y")).as("id_hi"))
      .distinct().persist()
    time("candidate join+distinct")(println("  cands: " + cand.count()))
    val la = hashed.select(col("id").as("id_lo"), col("hs").as("hs_a"))
    val lb = hashed.select(col("id").as("id_hi"), col("hs").as("hs_b"))
    val out = cand.join(la, "id_lo").join(lb, "id_hi")
      .withColumn("inter",
        expr("graft_sorted_intersect(hs_a, hs_b)").cast("double"))
      .filter(greatest(
        graft.Dets.safeDiv(col("inter"), size(col("hs_a"))),
        graft.Dets.safeDiv(col("inter"), size(col("hs_b")))) >= 0.9)
    time("verify")(println("  pairs: " + out.count()))
    s.stop()
  }
}
