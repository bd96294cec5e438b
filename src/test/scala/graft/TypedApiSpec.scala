package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** The typed Dataset[T] surface (§1.1: case-class Encoders where type
  * safety helps): a typed pipeline must agree with the untyped
  * DataFrame/oracle-gated form, and typed filters must still push down
  * to the parquet scan when expressed as column predicates. */
case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
  l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
  l_discount: Double, l_tax: Double, l_returnflag: String,
  l_linestatus: String, l_shipdate: java.sql.Timestamp)

class TypedApiSpec extends SparkSpec {

  private def typedLineitem: Dataset[Lineitem] = {
    import spark.implicits._
    Tables.load(spark, Sf, "lineitem").as[Lineitem]
  }

  test("typed groupByKey aggregation agrees with the DataFrame form") {
    import spark.implicits._
    // typed path: per-row quantization identical to CAST(x AS DECIMAL(38,6))
    def micros(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
    val typedRows = typedLineitem
      .filter(col("l_returnflag") === "R")
      .groupByKey(_.l_linestatus)
      .mapGroups { (status, rows) =>
        (status, rows.map(r =>
          micros(r.l_extendedprice * (1 - r.l_discount))).sum)
      }
      .collect().toMap
    val untypedRows = Tables.load(spark, Sf, "lineitem")
      .filter(col("l_returnflag") === "R")
      .groupBy("l_linestatus")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(Dets.Dec)).as("rev"))
      .collect()
      .map(r => r.getString(0) ->
        r.getDecimal(1).movePointRight(6).longValueExact())
      .toMap
    assert(typedRows == untypedRows)
  }

  test("typed column predicate still pushes to the parquet reader") {
    val ds = typedLineitem.filter(col("l_quantity") > 45.0)
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("l_quantity"),
      plan.take(1500))
  }
}
