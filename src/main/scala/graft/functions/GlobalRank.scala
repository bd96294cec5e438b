package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking.
  *
  * A window with no PARTITION BY (q34's ntile/percent_rank shape) moves
  * the ENTIRE dataset through one task — fine at gate scale, fatal at
  * 100 TB. The distributed form: range-repartition on the sort key so
  * partitions hold disjoint key ranges, rank locally within each
  * partition, then shift each partition's ranks by the total count of
  * all earlier partitions. The per-partition counts are one tiny
  * driver-side collect (bounded by partition count, not data size).
  *
  * Requires `order` to be a TOTAL order (unique tie-break) — then the
  * result is independent of where range boundaries fall, so the range
  * sampler's nondeterministic split points never change the output
  * (asserted against the single-partition window form in SkewSpec).
  */
object GlobalRank {

  /** Append global per-group running-sum (`cum`) and group-total (`n`)
    * columns for `weightCol` ordered by `orderCol`, without a per-group
    * single-task window: a few heavy groups would otherwise pull the
    * whole table through a handful of sort tasks. The value domain is
    * cut into `buckets` equal-width slices between the global min and
    * max of `orderCol` — the bucket id is a PURE FUNCTION of the value,
    * so unlike `repartitionByRange`'s sampled boundaries every job sees
    * the same partitioning with no checkpoint and no driver-side offset
    * collect. The running sum runs locally per (group, bucket) task;
    * cross-bucket offsets and group totals come from a window over the
    * tiny (groups × buckets) bucket-total table, broadcast back.
    *
    * Requirements: `orderCol` numeric, non-null, and non-NaN (a NaN
    * order value raises a descriptive error rather than silently
    * missing the bucket join), (group, order)
    * unique rows — the natural shape after a value histogram groupBy.
    * Equal-width buckets skew with pathological value distributions
    * (all mass in one slice degrades toward the single-task window,
    * never past it); value histograms of prices/counts spread fine. */
  def cumSum(df: DataFrame, groupCol: String, orderCol: String,
    weightCol: String, buckets: Int = 256): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // The global min/max attach as a broadcast one-row aggregate, NOT a
    // driver-side head(): a separate bounds action would recompute the
    // whole upstream lineage (typically a source-scanning histogram
    // groupBy) a second time, doubling the scans — as an attached
    // subtree the heavy exchange is shared and the source is read once.
    // (Persisting `df` here was measured SLOWER — q46 4.0→8.5 s at
    // sf0.1: the cache materialization defeats the agg-side column
    // pruning of the bounds subtree while ReusedExchange already
    // shares the histogram exchange across the broadcast jobs.)
    val bounds = df.agg(min(col(orderCol)).cast("double").as("__lo"),
      max(col(orderCol)).cast("double").as("__hi"))
    // NaN order values would bucket to NULL and silently vanish in the
    // offset join below — raise with the actual problem named instead
    val b = when(isnan(col(orderCol).cast("double")),
        raise_error(lit(s"GlobalRank.cumSum: NaN in order column $orderCol")))
      .when(col("__lo").isNull || col("__hi") === col("__lo"), lit(0))
      .otherwise(least(lit(buckets - 1), greatest(lit(0),
        floor((col(orderCol).cast("double") - col("__lo"))
          / ((col("__hi") - col("__lo")) / buckets)).cast("int"))))
    // both the local window and the bucket totals hang off this ONE
    // exchange (identical subtree -> ReuseExchange)
    val shuffled = df.crossJoin(broadcast(bounds))
      .withColumn("__b", b).drop("__lo", "__hi")
      .repartition(col(groupCol), col("__b"))
    val withCum = shuffled.withColumn("__lcum",
      sum(col(weightCol)).over(
        Window.partitionBy(col(groupCol), col("__b"))
          .orderBy(col(orderCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = shuffled.groupBy(col(groupCol).as("__g"), col("__b"))
      .agg(sum(col(weightCol)).as("__bt"))
      .withColumn("__off", coalesce(
        sum("__bt").over(Window.partitionBy("__g").orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum("__bt").over(Window.partitionBy("__g")))
      .select(col("__g"), col("__b").as("__ob"), col("__off"), col("n"))
    // <=> : a NULL group (legal in SQL GROUP BY) must still find its
    // offset row rather than silently vanishing from the output
    // an integral weight column keeps the documented long `cum`; a
    // fractional one keeps the sum's exact type — casting 2.9 to 2
    // while `n` stays exact would make the final bucket's cum != n
    val cumRaw = col("__lcum") + col("__off")
    val cum = df.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => cumRaw.cast("long")
      case _ => cumRaw
    }
    withCum.join(broadcast(offs),
        withCum(groupCol) <=> offs("__g") && withCum("__b") === offs("__ob"))
      .withColumn("cum", cum)
      .drop("__b", "__g", "__ob", "__lcum", "__off", "__bt")
  }

  /** Append a per-group STRICT-prefix running-max column (`pmax` = max
    * of `valueCol` over rows whose `orderCol` is strictly smaller; NULL
    * when none precede) — the dominance-sweep primitive (q143 skyline),
    * distributed with the [[cumSum]] bucket scheme instead of a
    * single-task global window: local strict-prefix max per (group,
    * bucket), cross-bucket offsets from a window over the tiny
    * (groups × buckets) bucket-max table, broadcast back.
    *
    * Requirements as [[cumSum]]: `orderCol` numeric/non-NaN and one row
    * per (group, order) — the natural shape after a per-value groupBy
    * (strictness then equals the ROWS ... 1 PRECEDING local frame). */
  def prefixMax(df: DataFrame, groupCol: String, orderCol: String,
    valueCol: String, buckets: Int = 256): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val bounds = df.agg(min(col(orderCol)).cast("double").as("__lo"),
      max(col(orderCol)).cast("double").as("__hi"))
    val b = when(isnan(col(orderCol).cast("double")),
        raise_error(lit(s"GlobalRank.prefixMax: NaN in order column $orderCol")))
      .when(col("__lo").isNull || col("__hi") === col("__lo"), lit(0))
      .otherwise(least(lit(buckets - 1), greatest(lit(0),
        floor((col(orderCol).cast("double") - col("__lo"))
          / ((col("__hi") - col("__lo")) / buckets)).cast("int"))))
    val shuffled = df.crossJoin(broadcast(bounds))
      .withColumn("__b", b).drop("__lo", "__hi")
      .repartition(col(groupCol), col("__b"))
    val withLoc = shuffled.withColumn("__lpm",
      max(col(valueCol)).over(
        Window.partitionBy(col(groupCol), col("__b"))
          .orderBy(col(orderCol).asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
    val offs = shuffled.groupBy(col(groupCol).as("__g"), col("__b"))
      .agg(max(col(valueCol)).as("__bm"))
      .withColumn("__om",
        max("__bm").over(Window.partitionBy("__g").orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__g"), col("__b").as("__ob"), col("__om"))
    withLoc.join(broadcast(offs),
        withLoc(groupCol) <=> offs("__g") && withLoc("__b") === offs("__ob"))
      // greatest skips nulls (and is null only when BOTH are): exactly
      // "no strictly-smaller row anywhere" => NULL
      .withColumn("pmax", greatest(col("__lpm"), col("__om")))
      .drop("__b", "__g", "__ob", "__lpm", "__om")
  }

  /** Append a global `rn` column: row_number over `order` without a
    * single-partition window. */
  def rowNumber(df: DataFrame, order: Seq[Column], parts: Int = 0): DataFrame =
    rowNumberWithTotal(df, order, parts)._1

  /** [[rowNumber]] plus the total row count, which the ranking job has
    * already paid for (it is the sum of the per-partition counts) — the
    * driver-side N lets callers derive ntile/percent_rank/cume_dist from
    * `rn` by pure arithmetic instead of a second pass or a
    * single-partition global aggregate. */
  def rowNumberWithTotal(df: DataFrame, order: Seq[Column], parts: Int = 0)
  : (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    // localCheckpoint materializes the ranged partitioning ONCE: the range
    // sampler re-seeds per action, so without it the counts job and the
    // offset-join job could see different split points and the offsets
    // would mismatch the local ranks. Cutting lineage pins both jobs to
    // the same physical partitions.
    val ranged = df.repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy("__pid").orderBy(order: _*)))
    val counts = local.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c)
    }.sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("__pid", "__off")
    val ranked = local.join(broadcast(offDf), "__pid")
      .withColumn("rn", (col("__lrn") + col("__off")).cast("long"))
      .drop("__pid", "__lrn", "__off")
    (ranked, counts.map(_._2).sum)
  }
}
