package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (normative inventory).
  * Each family object contributes (queries, oracle) map pairs; keys match
  * SURVEY §2 exactly and every aggregate/computed column is aliased
  * identically in the Spark builder and the DuckDB oracle SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.queries("q20_agg_pricing")(spark, "/root/testdata/sf0.001")

  private val families: Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])] = Seq(
    (ScanFilterQueries.queries, ScanFilterQueries.oracle),
    (JoinQueries.queries, JoinQueries.oracle),
    (AggQueries.queries, AggQueries.oracle),
    (SortSetQueries.queries, SortSetQueries.oracle),
    (WindowQueries.queries, WindowQueries.oracle),
    (ScalarQueries.queries, ScalarQueries.oracle),
    (EventQueries.queries, EventQueries.oracle),
    (TextQueries.queries, TextQueries.oracle),
    (VectorQueries.queries, VectorQueries.oracle),
    (SketchQueries.queries, SketchQueries.oracle),
    (TfidfQueries.queries, TfidfQueries.oracle),
    (StatsQueries.queries, StatsQueries.oracle),
    (PivotQueries.queries, PivotQueries.oracle),
    (AnalyticsQueries.queries, AnalyticsQueries.oracle),
    (PipelineQueries.queries, PipelineQueries.oracle),
    (ServiceQueries.queries, ServiceQueries.oracle),
    (SourceQueries.queries, SourceQueries.oracle),
    (MultimodalQueries.queries, MultimodalQueries.oracle),
    (CurationQueries.queries, CurationQueries.oracle),
    (CorpusStatsQueries.queries, CorpusStatsQueries.oracle),
    (GraphQueries.queries, GraphQueries.oracle),
    (TimeSeriesQueries.queries, TimeSeriesQueries.oracle),
    (BasketQueries.queries, BasketQueries.oracle),
    (CrossModalQueries.queries, CrossModalQueries.oracle)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mergedDisjoint(families.map(_._1), "queries")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    mergedDisjoint(families.map(_._2), "oracleSql")

  /** `++` would silently let a reused query key pair one family's
    * DataFrame with another family's oracle SQL — with 18 hand-
    * maintained families, fail loudly at first access instead. */
  private def mergedDisjoint[V](ms: Seq[Map[String, V]], what: String)
  : Map[String, V] = {
    val merged = ms.reduce(_ ++ _)
    require(merged.size == ms.map(_.size).sum,
      s"duplicate $what keys across families: " +
        ms.flatMap(_.keys).groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => k
        }.mkString(", "))
    merged
  }
}
