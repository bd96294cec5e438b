package graft

import java.nio.file.Files

import graft.sources.LakeWriter
import org.apache.spark.sql.functions._

/** §2.1 sink/source coverage the oracle can't express: partitioned
  * UNLOAD layout + partition-pruned read-back, and CSV/JSON COPY
  * round-trips with explicit schemas. */
class LakeWriterSpec extends SparkSpec {

  test("partitioned unload produces prunable lake layout") {
    val out = Files.createTempDirectory("graft_lake_").toString + "/li"
    val li = Tables.load(spark, Sf, "lineitem")
    LakeWriter.unloadPartitioned(li, out, Seq("l_returnflag"))
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("l_returnflag=")).sorted
    assert(dirs.toSeq == Seq("l_returnflag=A", "l_returnflag=N", "l_returnflag=R"))

    val back = spark.read.parquet(out).filter(col("l_returnflag") === "R")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("l_returnflag"), plan.take(1500))
    val expected = li.filter(col("l_returnflag") === "R").count()
    assert(back.count() == expected)
  }

  test("bucketed tables join with zero exchanges") {
    import graft.sources.LakeWriter
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, Sf, "orders")
      val li = Tables.load(spark, Sf, "lineitem")
      LakeWriter.writeBucketed(orders.select("o_orderkey", "o_orderpriority"),
        "b_orders", "o_orderkey", 8, Some("o_orderkey"))
      LakeWriter.writeBucketed(
        li.select(col("l_orderkey"), col("l_quantity")),
        "b_lineitem", "l_orderkey", 8, Some("l_orderkey"))
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed equi-join should be co-located:\n" + plan.take(2000))
      assert(plan.contains("SelectedBucketsCount"), plan.take(2000))
      val expected = orders.join(li,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("CSV round-trip preserves rows under explicit schema") {
    val out = Files.createTempDirectory("graft_csv_").toString + "/cust"
    val cust = Tables.load(spark, Sf, "customer")
    LakeWriter.unloadCsv(cust, out)
    val back = LakeWriter.copyCsv(spark, out, Tables.schemas("customer"))
    assert(back.count() == cust.count())
    val a = cust.orderBy("c_custkey").collect().map(_.toString).toSeq
    val b = back.orderBy("c_custkey").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("permissive JSON copy quarantines malformed lines without aborting") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_badjson_").toString
    val lines = Seq(
      """{"id": 1, "name": "ok-one"}""",
      """{"id": 2, "name": "ok-two"}""",
      """{"id": "NOT-A-NUMBER", "name": "bad-type"}""",
      """{{{ totally broken""",
      """{"id": 5, "name": "ok-three"}""")
    Files.write(java.nio.file.Paths.get(s"$dir/part0.json"),
      String.join("\n", lines: _*).getBytes)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val (good, bad) = LakeWriter.copyJsonPermissive(spark, dir, schema)
    assert(good.count() == 3)
    assert(good.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 5L))
    assert(bad.count() == 2)
    // FAILFAST on the same input aborts — the two modes are distinct
    intercept[Exception] {
      LakeWriter.copyJson(spark, dir, schema).collect()
    }
  }

  test("JSON round-trip preserves rows under explicit schema") {
    val out = Files.createTempDirectory("graft_json_").toString + "/part"
    val part = Tables.load(spark, Sf, "part")
    LakeWriter.unloadJson(part, out)
    val back = LakeWriter.copyJson(spark, out, Tables.schemas("part"))
    val a = part.orderBy("p_partkey").collect().map(_.toString).toSeq
    val b = back.orderBy("p_partkey").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("compaction honors the file-count contract and keeps content") {
    val base = Files.createTempDirectory("graft_compact_").toString
    val orders = Tables.load(spark, Sf, "orders")
    orders.repartition(16).write.mode("overwrite").parquet(s"$base/small")
    def parquetFiles(p: String): Array[java.io.File] =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$base/small").length == 16)
    LakeWriter.compact(spark, s"$base/small", s"$base/compacted", 3,
      Tables.schemas("orders"))
    assert(parquetFiles(s"$base/compacted").length == 3)
    val back = spark.read.schema(Tables.schemas("orders"))
      .parquet(s"$base/compacted")
    assert(back.count() == orders.count())
    val a = orders.orderBy("o_orderkey").collect().map(_.toString).toSeq
    val b = back.orderBy("o_orderkey").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
