package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q66 MinHash-LSH pipeline — identifies
  * whether candidate generation or exact-verify dominates at a given SF. */
object Q66Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q66prof] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    val d = Tables.loadSpread(s, dir, "documents")
      .withColumn("toks", TextFunctions.tokenSet(col("text")))
      .withColumn("hs", array_sort(expr("graft_token_hashes(toks)")))
      .withColumn("mh", expr("graft_minhash(hs, 16)"))
      .select(col("doc_id"), col("hs"), col("mh"))
    d.persist()
    time("minhash (docs)")(println(s"  docs=${d.count()}"))
    val banded = d.select(col("doc_id"),
        posexplode(expr("graft_band_keys(mh, 4, 4)")).as(Seq("band", "bkey")))
    banded.persist()
    time("band keys")(println(s"  band rows=${banded.count()}"))
    time("bucket histogram") {
      banded.groupBy("band", "bkey").count()
        .agg(count(lit(1)).as("buckets"), max("count").as("max_bucket"),
          sum(expr("count * (count - 1) / 2")).as("raw_pairs"))
        .show(false)
    }
    val rawJoin = banded.select(col("doc_id").as("id_lo"), col("band"), col("bkey"))
      .join(banded.select(col("doc_id").as("id_hi"),
        col("band").as("band_b"), col("bkey").as("bkey_b")),
        col("band") === col("band_b") && col("bkey") === col("bkey_b")
          && col("id_lo") < col("id_hi"))
      .select("id_lo", "id_hi", "band")
    time("raw join only")(println(s"  raw=${rawJoin.count()}"))
    val cand = rawJoin.select("id_lo", "id_hi").distinct()
    cand.persist()
    time("candidates (join+distinct)")(println(s"  cand=${cand.count()}"))
    val dk = d.withColumn("bks", expr("graft_band_keys(mh, 4, 4)"))
    val ka = dk.select(col("doc_id").as("id_lo"), col("bks").as("bks_a"))
    val kb = dk.select(col("doc_id").as("id_hi"), col("bks").as("bks_b"))
    val firstMatch = expr((0 until 3)
      .map(i => s"WHEN bks_a[$i] = bks_b[$i] THEN $i")
      .mkString("CASE ", " ", " ELSE 3 END"))
    val fb = rawJoin
      .join(broadcast(ka), "id_lo").join(broadcast(kb), "id_hi")
      .filter(col("band") === firstMatch)
      .select("id_lo", "id_hi")
    time("first-band filter")(println(s"  fb=${fb.count()}"))
    val ha = d.select(col("doc_id").as("id_lo"), col("hs").as("hs_a"))
    val hb = d.select(col("doc_id").as("id_hi"), col("hs").as("hs_b"))
    val out = cand.join(broadcast(ha), "id_lo").join(broadcast(hb), "id_hi")
      .withColumn("inter",
        expr("graft_sorted_intersect(hs_a, hs_b)").cast("double"))
      .withColumn("jac",
        col("inter") / (size(col("hs_a")) + size(col("hs_b")) - col("inter")))
      .filter(col("jac") >= 0.5)
    time("exact verify (from distinct)")(println(s"  pairs=${out.count()}"))
    s.stop()
  }
}
