package graft

import graft.plans.{GraftOps, TopKPerGroupExec}
import org.apache.spark.sql.functions._

/** The custom per-group top-k operator: result parity with the window
  * formulation, plan shape (partial → one exchange → final), and edge
  * cases (k larger than group, empty input, global top-k). */
class TopKPlanSpec extends SparkSpec {

  private def ordersJoined = {
    val o = Tables.load(spark, Sf, "orders")
    val c = Tables.load(spark, Sf, "customer")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
  }

  test("topKPerGroup equals the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val df = ordersJoined
    val got = GraftOps.topKPerGroup(df, Seq(col("c_mktsegment")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
      .orderBy("c_mktsegment", "rn").collect().map(_.toString)
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("c_mktsegment", "rn").collect().map(_.toString)
    assert(got.toSeq == want.toSeq)
  }

  test("plan shape: partial and final execs with exactly one exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case other => other +: other.children.flatMap(flatten)
    }
    val plan = GraftOps.topKPerGroup(ordersJoined, Seq(col("c_mktsegment")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .queryExecution.executedPlan
    val nodes = flatten(plan)
    val execs = nodes.collect { case e: TopKPerGroupExec => e }
    assert(execs.length == 2, s"expected partial+final, got:\n$plan")
    assert(execs.count(_.rankAttr.isDefined) == 1)
    val exchanges = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.length == 1, s"expected one exchange, got:\n$plan")
  }

  test("k exceeding group size emits the whole group, ranked") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
    val got = GraftOps.topKPerGroup(df, Seq(col("g")),
        Seq(col("v").desc), 10)
      .orderBy("g", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 2L, 1L), ("a", 1L, 2L), ("b", 3L, 1L)))
  }

  test("empty input and empty keys (global top-k)") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("g", "v")
    assert(GraftOps.topKPerGroup(empty, Seq(col("g")),
      Seq(col("v").asc), 5).count() == 0)
    val df = (1L to 100L).map(i => ("x", i)).toDF("g", "v")
    val top = GraftOps.topKPerGroup(df, Nil, Seq(col("v").desc), 4)
      .orderBy("rn").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(top.toSeq == Seq((100L, 1L), (99L, 2L), (98L, 3L), (97L, 4L)))
  }
}
