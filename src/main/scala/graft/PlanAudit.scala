package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: audit every declared query's physical plan for scale red
  * flags — nested-loop/cartesian joins, exchange (shuffle) counts, sort
  * counts, filter pushdown. `runMain graft.PlanAudit [sfDir]`.
  *
  * This is the ".explain(formatted) and iterate" loop in executable
  * form: a plan that looks fine at sf0.01 but shows an unexpected BNLJ
  * or a pile of exchanges is a 100 TB bottleneck in waiting.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(f"${"query"}%-22s ${"exch"}%4s ${"sort"}%4s ${"bcast"}%5s  flags")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).size
        val flags = Seq(
          if (plan.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (plan.contains("BroadcastNestedLoopJoin")) Some("BNLJ") else None,
          if (plan.contains("Scan parquet") &&
            !plan.contains("PushedFilters: []") &&
            !plan.contains("PushedFilters: [")) Some("NO-PUSHDOWN-INFO") else None
        ).flatten.mkString(",")
        println(f"$name%-22s ${n("Exchange")}%4d ${n("\\bSort\\b")}%4d " +
          f"${n("Broadcast")}%5d  $flags")
      } catch {
        case e: Throwable => println(f"$name%-22s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
