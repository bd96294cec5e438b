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
