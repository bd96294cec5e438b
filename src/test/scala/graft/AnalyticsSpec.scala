package graft

import graft.operators.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Structural invariants for the operational-analytics family (q47/q48/
  * q53/q54) — value-level correctness is the DuckDB oracle's job; these
  * pin the semantics the oracle can't see (monotonicity, bounds, and
  * agreement with brute-force Scala on sf0.001).
  */
class AnalyticsSpec extends SparkSpec {

  private def run(name: String) =
    AnalyticsQueries.queries(name)(spark, Sf)

  test("q47 mode matches brute-force per-group argmax") {
    val got = run("q47_mode").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val rows = Tables.load(spark, Sf, "orders")
      .select("o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = rows.groupBy(_._1).toSeq.map { case (st, xs) =>
      val (prio, cnt) = xs.groupBy(_._2).view.mapValues(_.size).toSeq
        .minBy { case (p, c) => (-c, p) }
      (st, prio, cnt.toLong)
    }.sortBy(_._1)
    assert(got == want)
  }

  test("q48 entropy is bounded by ln(n_hours) and non-negative") {
    val rows = run("q48_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nHours, h) = (r.getLong(2), r.getDouble(3))
      assert(h >= 0.0, s"negative entropy $h")
      // uniform distribution over n_hours buckets is the maximum;
      // 1e-4 slack for the 6dp per-term quantization
      assert(h <= math.log(nHours.toDouble) + 1e-4,
        s"entropy $h exceeds ln($nHours)")
    }
  }

  test("q53 funnel stages are monotonically non-increasing") {
    val byStage = run("q53_funnel").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(byStage.keySet == Set(1, 2, 3))
    assert(byStage(1) >= byStage(2) && byStage(2) >= byStage(3))
    assert(byStage(1) > 0)
  }

  test("q49 OHLC bars are internally consistent and complete") {
    val rows = run("q49_ohlc").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (open, close, high, low, n) =>
      assert(low <= math.min(open, close) && math.max(open, close) <= high)
      assert(n >= 1)
    }
    assert(rows.map(_._5).sum == Tables.load(spark, Sf, "events").count())
  }

  test("misra-gries sketch keeps every heavy item within the MG bound") {
    import spark.implicits._
    // skewed stream: item i repeated (50 - i) times, i = 0..49, shuffled
    // deterministically and spread over parallel partitions
    val items = (0 until 50).flatMap(i => Seq.fill(50 - i)(s"item$i"))
      .sortBy(_.hashCode)
    val n = items.size
    val cap = 8
    val ds = items.toDF("it").repartition(7).select(col("it").as[String])
    val sketch = ds
      .select(new graft.functions.HeavyHittersAggregator(cap)
        .toColumn.name("hh"))
      .head().toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n.toDouble / (cap + 1)
    exact.foreach { case (item, cnt) =>
      if (cnt > bound)
        assert(sketch.contains(item), s"heavy item $item (cnt=$cnt) missed")
      sketch.get(item).foreach { est =>
        assert(est <= cnt && est >= cnt - bound,
          s"$item estimate $est outside [${cnt - bound}, $cnt]")
      }
    }
    assert(sketch.size <= cap)
  }

  test("q93 two-pass heavy hitters equals the exact threshold set") {
    import graft.operators.SketchQueries
    val got = SketchQueries.queries("q93_heavy_hitters")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = Tables.loadSpread(spark, Sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("tok"))
      .collect().map(_.getString(0)).toSeq
    val n = toks.size
    val want = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * 65 > n }
      .sortBy { case (t, c) => (-c, t) }
    assert(got == want && got.nonEmpty)
  }

  test("q54 retention: offset-0 count per cohort equals its cohort size") {
    val e = Tables.load(spark, Sf, "events")
    // tsOut both sides: q54 emits timestamp_ntz (LocalDateTime rows)
    val cohortSizes = e.groupBy("user_id")
      .agg(Dets.tsOut(date_trunc("day", min("ts"))).as("cohort"))
      .groupBy("cohort").agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val got = run("q54_retention").collect()
      .map(r => (r.get(0).toString, r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty)
    // every user is active on their own cohort day, so offset 0 must
    // reproduce the cohort size exactly
    got.filter(_._2 == 0).foreach { case (day, _, n) =>
      assert(cohortSizes(day) == n, s"cohort $day: $n vs ${cohortSizes(day)}")
    }
    got.foreach { case (_, off, n) =>
      assert(off >= 0 && off <= 7 && n > 0)
    }
  }
}
