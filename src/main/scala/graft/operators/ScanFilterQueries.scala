package graft.operators

import graft.{Dets, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.1 scans/sources + §2.2 projections/filters.
  *
  * Scale notes: every query selects its columns immediately after the scan
  * so Catalyst prunes the parquet `ReadSchema`, and predicates are plain
  * column comparisons so they reach the reader as `PushedFilters`
  * (row-group + page-level skipping — the thing that makes a 100 TB scan
  * touch only the matching fraction).
  */
object ScanFilterQueries {
  import Dets._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> ((s, dir) =>
      t(s, dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")),

    "q02_scan_pushdown" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), tsOut(col("l_shipdate")).as("l_shipdate"))
        .orderBy("l_orderkey", "l_linenumber")),

    "q03_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          // try_cast: ANSI cast throws on a malformed value; NULL keeps a
          // 100 TB ingest alive (DuckDB's CAST would error on dirty data —
          // a documented divergence; identical on any parseable value)
          expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
        .orderBy("event_id")),

    "q04_case_segment" -> ((s, dir) =>
      t(s, dir, "customer")
        .withColumn("band",
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 1000, "low")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_cust"), decSumD(col("c_acctbal")).as("sum_bal"))
        .orderBy("band")),

    "q05_pred_compound" -> ((s, dir) =>
      t(s, dir, "part")
        .filter((col("p_name").like("%widget%") &&
          col("p_type").isin("ECONOMY", "PROMO") &&
          col("p_size").between(10, 30) &&
          col("p_brand").isNotNull) ||
          (col("p_retailprice") > 1500 && col("p_type") === "STANDARD"))
        .select("p_partkey", "p_name", "p_type", "p_size", "p_retailprice")
        .orderBy("p_partkey")),

    "q06_string_proj" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_u"),
          substring(col("c_name"), 1, 8).as("name_pre"),
          concat(col("c_name"), lit("|"), col("c_mktsegment")).as("tagged"),
          length(col("c_name")).cast("long").as("name_len"),
          regexp_replace(col("c_name"), "Customer#", "C#").as("short_name"),
          regexp_extract(col("c_name"), "[0-9]+", 0).as("digits"))
        .orderBy("c_custkey")),

    // Schema'd JSON ingest — from_json (JsonToStructs) where q03 gates
    // the path-expression form (GetJsonObject): parse props against a
    // declared struct schema and aggregate the typed field. A parse
    // failure under the declared schema surfaces as NULL (counted in
    // the gate), which is the ingest-side contract a COPY pipeline
    // relies on.
    "q193_json_struct" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), count(col("k")).as("n_parsed"),
          sum(col("k")).as("sum_k"),
          count_distinct(col("k")).as("n_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"))
  )

  val oracle: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    "q02_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01' AND l_returnflag = 'R'
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin,

    "q03_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin,

    "q04_case_segment" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 1000 THEN 'low'
        |            WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band,
        |       COUNT(*) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY 1 ORDER BY band ASC NULLS FIRST""".stripMargin,

    "q05_pred_compound" ->
      """SELECT p_partkey, p_name, p_type, p_size, p_retailprice FROM part
        |WHERE (p_name LIKE '%widget%' AND p_type IN ('ECONOMY','PROMO')
        |       AND p_size BETWEEN 10 AND 30 AND p_brand IS NOT NULL)
        |   OR (p_retailprice > 1500 AND p_type = 'STANDARD')
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    "q06_string_proj" ->
      """SELECT c_custkey,
        |       UPPER(c_mktsegment) AS seg_u,
        |       SUBSTRING(c_name, 1, 8) AS name_pre,
        |       c_name || '|' || c_mktsegment AS tagged,
        |       CAST(LENGTH(c_name) AS BIGINT) AS name_len,
        |       REPLACE(c_name, 'Customer#', 'C#') AS short_name,
        |       REGEXP_EXTRACT(c_name, '[0-9]+') AS digits
        |FROM customer ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "q193_json_struct" ->
      """WITH p AS (
        |  SELECT event_type,
        |         CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_parsed,
        |       CAST(SUM(k) AS BIGINT) AS sum_k,
        |       COUNT(DISTINCT k) AS n_k,
        |       MIN(k) AS min_k, MAX(k) AS max_k
        |FROM p GROUP BY 1 ORDER BY event_type ASC NULLS FIRST""".stripMargin
  )
}
