package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of q103's plan at a given SF —
  * isolates the bigram explode, the per-doc collapse, the vocabulary
  * aggs, and the final join+agg. `runMain graft.tools.Q103Profile <sfDir>` */
object Q103Profile {
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
      println(f"[q103prof] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    // warmup: JVM + parquet reader + codegen basics
    graft.Tables.load(s, dir, "documents").count()

    val docs = graft.Tables.loadSpread(s, dir, "documents")
    time("scan+tokens count") {
      docs.select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
        .selectExpr("sum(size(t))").collect()
    }
    val bg = docs.withColumn("toks",
        graft.functions.TextFunctions.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> named_struct('w1', toks[i-1], 'w2', toks[i]))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    time("bigram explode count") { bg.count() }
    val occ = bg
      .select(col("doc_id"), xxhash64(col("w1")).as("h1"),
        xxhash64(col("w1"), col("w2")).as("h2"))
      .groupBy("doc_id", "h1", "h2").agg(count(lit(1)).as("c"))
    time("occ collapse") { occ.count() }
    val bf = occ.groupBy("h1", "h2").agg(sum("c").as("bf"))
    time("bf (recompute occ)") { bf.count() }
    val cf = bf.groupBy("h1").agg(sum("bf").as("cf"))
    val full = occ.join(bf, Seq("h1", "h2")).join(cf, Seq("h1"))
      .withColumn("term",
        round(log(col("cf").cast("double") / col("bf")), 6)
          .cast(graft.Dets.Dec))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        round(sum(col("term") * col("c")).cast("double")
          / sum(col("c")), 4).as("surprisal4"))
      .orderBy("doc_id")
    time("full q103 (all recompute)") { full.count() }
    time("full q103 again") { full.count() }
    s.stop()
  }
}
