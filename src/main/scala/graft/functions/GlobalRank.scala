package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
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
    * whole table through a handful of sort tasks. Range-partition on
    * (group, order) so every task holds a contiguous slice of one or
    * more groups, run the running sum locally per (partition, group),
    * and shift by the earlier partitions' per-group totals (one tiny
    * driver collect, bounded by partitions × groups). (group, order)
    * pairs must be unique rows — the natural shape after a value
    * histogram groupBy — so `cum` is independent of where the range
    * boundaries fall. */
  def cumSum(df: DataFrame, groupCol: String, orderCol: String,
    weightCol: String, parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val np = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    // one materialization: the sampler behind repartitionByRange re-seeds
    // per action, so the totals job and the final join must see the same
    // physical partitions (same reasoning as rowNumber below)
    val ranged = df.repartitionByRange(np, col(groupCol).asc, col(orderCol).asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("__lcum",
      sum(col(weightCol)).over(Window.partitionBy(col("__pid"), col(groupCol))
        .orderBy(col(orderCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = local.groupBy("__pid", groupCol)
      .agg(max("__lcum").as("__t")).collect()
      .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    val offRows = totals.map { case (pid, g, _) =>
      val off = totals.collect { case (p2, g2, t) if g2 == g && p2 < pid => t }.sum
      val n = totals.collect { case (_, g2, t) if g2 == g => t }.sum
      Row(pid, g, off, n)
    }
    val gField = df.schema(groupCol)
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        gField.copy(name = "__g"),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // <=> : a NULL group (legal in SQL GROUP BY) must still find its
    // offset row rather than silently vanishing from the output
    local.join(broadcast(offDf),
        local("__pid") === offDf("__pid") && local(groupCol) <=> offDf("__g"))
      .withColumn("cum", (col("__lcum") + col("__off")).cast("long"))
      .drop(offDf("__pid"))
      .drop("__pid", "__g", "__lcum", "__off")
  }

  /** Append a global `rn` column: row_number over `order` without a
    * single-partition window. */
  def rowNumber(df: DataFrame, order: Seq[Column], parts: Int = 0): DataFrame = {
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
    local.join(broadcast(offDf), "__pid")
      .withColumn("rn", (col("__lrn") + col("__off")).cast("long"))
      .drop("__pid", "__lrn", "__off")
  }
}
