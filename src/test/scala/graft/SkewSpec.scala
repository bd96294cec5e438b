package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation must be result-identical to direct
  * aggregation (the [D2] decimal sums are associative+commutative),
  * including on deliberately skewed data. */
class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation on lineitem") {
    val li = Tables.load(spark, Sf, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(Dets.Dec)).as("sum_qty"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), salts = 16,
      Map("sum_qty" -> col("l_quantity")))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    assert(salted == direct)
  }

  test("salted aggregation equals direct on a single hot key") {
    import spark.implicits._
    val hot = (1 to 50000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"cold$i", i.toDouble))
    val df = hot.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v").cast(Dets.Dec)).as("sum_qty"))
      .orderBy("k").collect().map(_.toString).toSeq
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 32,
      Map("sum_qty" -> col("v")))
      .orderBy("k").collect().map(_.toString).toSeq
    assert(salted == direct)
  }
}
