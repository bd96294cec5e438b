package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
object MhDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "the quick brown fox jumps over the lazy cat")
    ).toDF("id", "t")
      .withColumn("toks", TextFunctions.tokenSet(col("t")))
      .withColumn("hs", array_sort(expr("graft_token_hashes(toks)")))
      .withColumn("mh", expr("graft_minhash(hs, 16)"))
      .withColumn("bk8", expr("graft_band_keys(mh, 8, 2)"))
      .withColumn("bk4", expr("graft_band_keys(mh, 4, 4)"))
    df.select("id", "mh").collect().foreach(r =>
      println(s"mh ${r.getLong(0)}: ${r.getSeq[Long](1).mkString(",")}"))
    df.select("id", "bk8").collect().foreach(r =>
      println(s"bk8 ${r.getLong(0)}: ${r.getSeq[Long](1).mkString(",")}"))
    spark.stop()
  }
}
