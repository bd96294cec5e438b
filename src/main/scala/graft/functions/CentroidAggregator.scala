package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (§2.11): per-group embedding centroid.
  *
  * Determinism design: each float is quantized to DECIMAL(38,6) micros
  * (exactly DuckDB's `CAST(x AS DECIMAL(38,6))`) and accumulated as a
  * Long — an exact, associative, commutative sum, so Spark's partial
  * aggregation + merge across any partition layout yields identical
  * results, matching the oracle's per-dimension decimal average.
  * finish() mirrors `ROUND(CAST(sum AS DOUBLE) / n, 4)`.
  */
class CentroidAggregator(dim: Int)
  extends Aggregator[Array[Float], (Array[Long], Long), Array[Double]] {

  override def zero: (Array[Long], Long) = (Array.fill(dim)(0L), 0L)

  private def micros(x: Float): Long = {
    // BigDecimal.valueOf(NaN) would throw an opaque NumberFormatException
    // from deep inside the aggregation; name the actual problem instead
    require(!x.isNaN && !x.isInfinite,
      s"CentroidAggregator: non-finite component $x in an input vector")
    JBigDecimal.valueOf(x.toDouble).setScale(6, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  override def reduce(b: (Array[Long], Long), a: Array[Float]): (Array[Long], Long) = {
    // a silent `min(dim, a.length)` bound would truncate wider vectors
    // into a wrong-but-plausible centroid; mismatches must fail loudly
    require(a.length == dim,
      s"CentroidAggregator(dim=$dim) got a ${a.length}-dim vector")
    val sums = b._1
    var i = 0
    while (i < dim) { sums(i) += micros(a(i)); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) = {
    val sums = x._1
    var i = 0
    while (i < dim) { sums(i) += y._1(i); i += 1 }
    (sums, x._2 + y._2)
  }

  override def finish(r: (Array[Long], Long)): Array[Double] = {
    val n = r._2
    // SQL AVG semantics for an empty group: NULL, not a NaN-filled
    // array (0.0/0 would also crash BigDecimal.valueOf)
    if (n == 0) null
    else r._1.map { s =>
      val avg = (s.toDouble / 1e6) / n
      JBigDecimal.valueOf(avg).setScale(4, RoundingMode.HALF_UP).doubleValue()
    }
  }

  override def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()

  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
