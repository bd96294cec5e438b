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

  test("salted top-k equals the direct window form (q30 shape)") {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.load(spark, Sf, "orders")
      .join(Tables.load(spark, Sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
    val order = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val direct = o.withColumn("rk", row_number().over(
        Window.partitionBy("c_mktsegment").orderBy(order: _*)))
      .filter(col("rk") <= 3)
      .select("c_mktsegment", "o_orderkey", "rk")
      .collect().map(_.toString).toSet
    val salted = graft.functions.Skew
      .saltedTopK(o, Seq("c_mktsegment"), order, k = 3, salts = 16)
      .select("c_mktsegment", "o_orderkey", "rk")
      .collect().map(_.toString).toSet
    assert(salted == direct)
  }

  test("distributed global row_number equals the single-partition window") {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.load(spark, Sf, "orders")
      .select("o_orderkey", "o_totalprice")
    val order = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val direct = o.withColumn("rn",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("o_orderkey", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = graft.functions.GlobalRank.rowNumber(o, order, parts = 8)
      .select("o_orderkey", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == direct)
  }

  test("range-partitioned cumSum equals the per-group window form") {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.load(spark, Sf, "orders")
      .groupBy(col("o_orderstatus"), col("o_totalprice"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val direct = hist
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n",
        sum("cnt").over(Window.partitionBy("o_orderstatus")))
      .select("o_orderstatus", "o_totalprice", "cum", "n")
      .collect().map(_.toString).toSet
    val dist = graft.functions.GlobalRank
      .cumSum(hist, "o_orderstatus", "o_totalprice", "cnt", buckets = 8)
      .select("o_orderstatus", "o_totalprice", "cum", "n")
      .collect().map(_.toString).toSet
    assert(dist == direct)
    // degenerate domains: single distinct value, and a single bucket
    val one = hist.filter(col("o_totalprice") === hist
      .agg(min("o_totalprice")).head.getDouble(0))
    val oneCum = graft.functions.GlobalRank
      .cumSum(one, "o_orderstatus", "o_totalprice", "cnt").collect()
    assert(oneCum.nonEmpty && oneCum.forall(r =>
      r.getAs[Long]("cum") == r.getAs[Long]("n")))
  }

  test("salted aggregation with a caller discriminator equals direct") {
    // the deterministic-salt path: discriminator = the order key, so the
    // salt is a pure function of row content (retry-safe, no checkpoint)
    val li = Tables.load(spark, Sf, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(Dets.Dec)).as("sum_px"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), salts = 16,
      Map("sum_px" -> col("l_extendedprice")),
      discriminator = Some(col("l_orderkey") * 8 + col("l_linenumber")))
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
