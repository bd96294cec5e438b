package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers implementing SURVEY.md §2 conventions [D1]–[D4].
  *
  * The driver hash-compares our parquet dumps against DuckDB output, so
  * every emitted value must be bit-identical across engines AND across
  * partition counts. Double SUM/AVG is reassociation-dependent; we cast
  * inputs to DECIMAL(38,6) (exact, associative — safe to combine in any
  * partial-aggregation order, which is also what makes it correct on a
  * 1000-executor cluster) and round float-derived scalars to 4dp.
  */
object Dets {
  val Dec: DecimalType = DecimalType(38, 6)

  /** [D2] exact associative sum: SUM(CAST(x AS DECIMAL(38,6))).
    * Spark's sum over DECIMAL(38,6) yields DECIMAL(38,6) — same as DuckDB. */
  def decSum(c: Column): Column = sum(c.cast(Dec))

  /** [D2] exact decimal sum emitted as DOUBLE. Decimal columns must never
    * reach the output: the oracle harness fetches DuckDB DECIMAL as
    * float64 while Spark parquet keeps decimal objects, so the value hash
    * diverges on representation even when the numbers are equal. Both
    * engines' decimal→double casts are correctly rounded (verified
    * bit-identical), so casting the exact sum at the very end keeps the
    * order-independence of decimal aggregation AND a portable wire type.
    * Oracle side must mirror with CAST(SUM(...) AS DOUBLE). */
  def decSumD(c: Column): Column = decSum(c).cast("double")

  /** [D2] deterministic average: exact decimal sum, one double division,
    * rounded to 4dp. Identical formulation on the oracle side. */
  def decAvg(c: Column): Column =
    round(decSum(c).cast("double") / count(lit(1)), 4)

  /** [D3] round float-derived scalars to 4dp. */
  def r4(c: Column): Column = round(c, 4)

  /** Division that yields NULL on a zero divisor — DuckDB's x/0 result,
    * and the only survivable form under Spark 4's default ANSI mode
    * (where / throws DIVIDE_BY_ZERO). Use for every division whose
    * divisor depends on data: empty token sets, zero vectors, and
    * single-row groups exist at 100 TB even though the fixtures lack
    * them, and a crashed stage is the worst possible semantics. */
  def safeDiv(a: Column, b: Column): Column = when(b =!= 0, a / b)

  /** [D4] emitted timestamps: cast to TIMESTAMP_NTZ (session tz is UTC, so
    * wall-clock is preserved) — parquet then stores naive µs exactly like
    * DuckDB's TIMESTAMP output, so the driver's hash sees identical values. */
  def tsOut(c: Column): Column = c.cast("timestamp_ntz")
}
