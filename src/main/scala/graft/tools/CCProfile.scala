package graft.tools
import graft.operators.{PipelineQueries, TextQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CCProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nodes = graft.Tables.loadSpread(spark, dir, "documents").select(col("doc_id").as("id"))
    val t0 = System.nanoTime()
    val pairs = TextQueries.nearDupPairs(spark, dir, 0.6).select(col("id_lo"), col("id_hi"))
    pairs.persist().count()
    println(f"[cc] pairs build ${(System.nanoTime - t0)/1e9}%.2f s, n=${pairs.count()}")
    val t1 = System.nanoTime()
    val out = PipelineQueries.connectedComponents(nodes, pairs)
    println(f"[cc] cc total ${(System.nanoTime - t1)/1e9}%.2f s, rows=${out.count()}")
    spark.stop()
  }
}
