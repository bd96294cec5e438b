package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.8 map-family and §2.5 range-frame coverage — exercised as
  * unit tests because no map-typed data ships and range frames over
  * doubles are deliberately kept out of the oracle gate (§2.5 note). */
class FunctionFamilySpec extends SparkSpec {

  test("SQL front door: registered views answer ad-hoc spark.sql queries") {
    Tables.registerViews(spark, Sf)
    val agg = spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |       sum(cast(l_quantity AS decimal(38,6))) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    assert(agg.count() == 3)
    val joined = spark.sql(
      """SELECT r_name, count(*) AS n_cust
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
    assert(joined.agg(org.apache.spark.sql.functions.sum("n_cust")).head.getLong(0) ==
      Tables.load(spark, Sf, "customer").count())
    // custom expressions usable from SQL after registration
    val dot = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d FROM embeddings LIMIT 1")
    assert(dot.head.getDouble(0) > 0.0)
  }

  test("map functions: map_from_arrays / element_at / map_keys") {
    import spark.implicits._
    val df = Seq((Array("a", "b"), Array(1, 2))).toDF("ks", "vs")
      .select(map_from_arrays(col("ks"), col("vs")).as("m"))
    val r = df.select(
      element_at(col("m"), "b"),
      size(map_keys(col("m"))),
      element_at(col("m"), "zz").isNull).head
    assert(r.getInt(0) == 2 && r.getInt(1) == 2 && r.getBoolean(2))
  }

  test("range frame over orderdate: 90-day trailing order counts") {
    val o = Tables.load(spark, Sf, "orders")
      .withColumn("day", datediff(col("o_orderdate"),
        lit("1995-01-01").cast("timestamp")))
    val w = Window.partitionBy("o_custkey").orderBy(col("day"))
      .rangeBetween(-90, Window.currentRow)
    val got = o.withColumn("trail", count(lit(1)).over(w))
      .select("o_custkey", "o_orderkey", "day", "trail")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getLong(3))).toMap
    // model check: recompute per customer in plain Scala
    val byCust = got.toSeq.groupBy(_._1._1)
    byCust.foreach { case (_, rows) =>
      val days = rows.map(_._2._1)
      rows.foreach { case ((_, _), (d, trail)) =>
        val expected = days.count(x => x >= d - 90 && x <= d)
        assert(trail == expected.toLong, s"day $d: $trail != $expected")
      }
    }
  }
}
