package graft.plans

import graft.functions.JaroWinklerSim
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, GreaterThan, GreaterThanOrEqual, Greatest, Least, Length, Literal, Multiply, Round}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Optimizer rule (SURVEY §4.3 tier (c), injected via
  * [[GraftExtensions]]): prepend a CHEAP length-ratio prefilter to
  * expensive Jaro–Winkler threshold predicates.
  *
  * Why it is sound: with ℓmin/ℓmax the two string lengths, the match
  * count m is at most ℓmin, so
  * `jaro ≤ (m/ℓa + m/ℓb + 1)/3 ≤ (2 + ℓmin/ℓmax)/3`, i.e.
  * `jaro ≥ j ⟹ ℓmin/ℓmax ≥ 3j − 2`. And the Winkler boost adds at most
  * `0.4·(1 − jaro)`, so `jw ≥ t ⟹ jaro ≥ (t − 0.4)/0.6` when t > 0.7
  * (and trivially `jaro ≥ t` otherwise). Chaining the two turns a
  * similarity threshold into a pure length predicate that whole-stage
  * codegen evaluates for a few cycles BEFORE the O(ℓ²)-window kernel —
  * the automatic version of the manual length band q141/q205 build by
  * hand. Matched shapes: `jw(a,b) >= t` / `> t` and the rounded form
  * `round(jw(a,b), s) >= t` (the round can lift the value by at most
  * 0.5·10⁻ˢ, absorbed into the threshold). The injected conjunct is
  * implied by the original predicate, so results are unchanged; a
  * semanticEquals guard keeps the rule idempotent across optimizer
  * passes.
  */
object JwPrefilterRule extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  /** ℓmin/ℓmax lower bound implied by `jw ≥ t`, if informative. */
  private[graft] def lengthRatioBound(t: Double): Option[Double] = {
    val jaroBound = if (t > 0.7) (t - 0.4) / 0.6 else t
    val r = 3 * jaroBound - 2
    if (r > 0 && r <= 1) Some(r) else None
  }

  private def lenPred(jw: JaroWinklerSim, r: Double): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(Length(jw.left), Length(jw.right))), DoubleType),
      Multiply(Literal(r, DoubleType),
        Cast(Greatest(Seq(Length(jw.left), Length(jw.right))), DoubleType)))

  /** Threshold predicates over a raw or rounded JW similarity.
    *
    * Harvested ONLY from the TOP-LEVEL conjuncts of the filter
    * condition, each matched exactly (not its subtree): a threshold
    * sitting under OR / NOT / CASE WHEN (e.g. `jw(a,b) >= t OR other`)
    * does NOT imply the length bound for the whole row — injecting it
    * as a top-level conjunct there would silently drop rows satisfied
    * by the other branch. */
  private def bounds(cond: Expression): Seq[Expression] =
    splitConjunctivePredicates(cond).flatMap {
      case GreaterThanOrEqual(jw: JaroWinklerSim, Literal(t: Double, DoubleType)) =>
        lengthRatioBound(t).map(lenPred(jw, _))
      case GreaterThan(jw: JaroWinklerSim, Literal(t: Double, DoubleType)) =>
        lengthRatioBound(t).map(lenPred(jw, _))
      case GreaterThanOrEqual(
          Round(jw: JaroWinklerSim, Literal(s: Int, IntegerType), _),
          Literal(t: Double, DoubleType)) =>
        lengthRatioBound(t - 0.5 * math.pow(10, -s)).map(lenPred(jw, _))
      case GreaterThan(
          Round(jw: JaroWinklerSim, Literal(s: Int, IntegerType), _),
          Literal(t: Double, DoubleType)) =>
        lengthRatioBound(t - 0.5 * math.pow(10, -s)).map(lenPred(jw, _))
      case _ => Nil
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val fresh = bounds(cond)
        .filterNot(p => cond.exists(_.semanticEquals(p)))
      if (fresh.isEmpty) f
      else Filter(fresh.reduce(And) match {
        case pre => And(pre, cond)
      }, child)
  }
}
