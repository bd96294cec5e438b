package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters sketch (§2.11's second typed
  * Aggregator): approximate top items by frequency in one pass with a
  * fixed `capacity`-entry counter map — the 100 TB path for "most
  * frequent terms" where the exact form (q64) must shuffle every
  * distinct term.
  *
  * Guarantees (standard MG, preserved under merge): every item with true
  * frequency > N/(capacity+1) survives in the sketch, and each reported
  * estimate undercounts its true frequency by at most N/(capacity+1),
  * never overcounts. Merge follows Agarwal et al. (PODS'12): sum
  * counters pairwise, then subtract the (capacity+1)-largest count and
  * drop non-positive entries — associative-enough for Spark's partial
  * aggregation tree (the error bound, not the exact counter state, is
  * what's preserved — hence no relational oracle; bounds are asserted
  * in AnalyticsSpec against exact counts).
  */
class HeavyHittersAggregator(capacity: Int)
  extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] = {
    if (item == null) return b
    val bumped = b.updatedWith(item) {
      case Some(c) => Some(c + 1)
      case None => Some(1L)
    }
    if (bumped.size <= capacity) bumped
    else bumped.collect { // full: decrement every counter, drop zeros
      case (k, c) if c > 1 => k -> (c - 1)
    }
  }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val summed = y.foldLeft(x) { case (acc, (k, c)) =>
      acc.updatedWith(k) {
        case Some(c0) => Some(c0 + c)
        case None => Some(c)
      }
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-largest count from everything
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      summed.collect { case (k, c) if c > cut => k -> (c - cut) }
    }
  }

  /** Descending by estimate, item tie-break — a deterministic ordering
    * of whatever counter set survived. */
  override def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
