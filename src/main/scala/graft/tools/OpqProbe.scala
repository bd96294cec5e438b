package graft.tools

import graft.Tables
import graft.operators.VectorQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: top-3 exact-L2 overlap of PQ variants at the q132 code
  * budget — flat, seeded rotations, variance-balancing permutation.
  * `runMain graft.tools.OpqProbe <sfDir>` */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.loadSpread(s, dir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val embN = emb.withColumn("n2", expr("graft_dot(embedding, embedding)"))
    val probesN = embN.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    val exact = graft.plans.GraftOps.topKPerGroup(
      broadcast(probesN).crossJoin(embN)
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("l2", round(col("pn2") + col("n2")
          - lit(2d) * expr("graft_dot(pe, embedding)"), 6))
        .select("probe_id", "vec_id", "l2"),
      Seq(col("probe_id")), Seq(col("l2").asc, col("vec_id").asc), 3)
      .select("probe_id", "vec_id").cache()
    val ne = exact.count()

    def score(name: String, ann: DataFrame): Unit = {
      val o = ann.select("probe_id", "vec_id")
        .join(exact, Seq("probe_id", "vec_id")).count()
      println(f"[opqprobe] $name%-12s ${o.toDouble / ne}%.4f ($o of $ne)")
    }

    val (m, ksub, iters, shortK) =
      (VectorQueries.PqM, VectorQueries.PqKsub, VectorQueries.PqIters,
        VectorQueries.PqShortK)
    Seq(7L, 13L, 101L).foreach { seed =>
      score(s"rot$seed", graft.api.PqOps.opqSearch(emb, "vec_id",
        "embedding", probes, 64, m, ksub, iters, shortK, 3, seed))
    }
    score("perm", graft.api.PqOps.opqSearchPermuted(emb, "vec_id",
      "embedding", probes, 64, m, ksub, iters, shortK, 3))
    Seq(1, 2, 3).foreach { alt =>
      val (r, cb, codes) = graft.api.PqOps.opqTrain(
        emb, "vec_id", "embedding", 64, m, ksub, iters, alt)
      val diag = r.map(rm =>
        (0 until 64).map(i => math.abs(rm(i)(i))).sum / 64).getOrElse(1d)
      val err = graft.api.PqOps.quantizationError(
        r, cb, codes, emb, "vec_id", "embedding", 64, m)
      score(f"learned$alt(diag$diag%.3f,err$err%.1f)",
        graft.api.PqOps.opqSearchWith(
          r, cb, codes, emb, "vec_id", "embedding", probes, 64, m, shortK, 3))
    }
    s.stop()
  }
}
