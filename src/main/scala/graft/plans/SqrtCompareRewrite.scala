package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.expressions.{DotProduct, SquaredL2}

/** Optimizer rule: comparisons of `sqrt(squared-distance)` against a
  * literal radius lose the per-row `sqrt`.
  *
  * Range search in SQL is naturally written `graft_l2(vec, q) <= r`
  * (= `Sqrt(SquaredL2(...)) <= r`), which costs a sqrt per scanned
  * row for a predicate that is monotone in the squared distance. The
  * textbook rewrite `x <= r²` is NOT exactly equivalence-preserving
  * in floating point (fl(r·r) can land on either side of the real r²,
  * flipping boundary rows). This rule instead precomputes, ONCE at
  * plan time, the exact threshold
  *
  *     T = max { x : fl(sqrt(x)) cmp r }
  *
  * by monotone bisection over the double bit lattice (fl(sqrt) is
  * non-decreasing, ~60 steps), so `sqrt(x) cmp r  ⟺  x <= T` holds
  * for EVERY double x ≥ 0 — bit-exact, including the boundary ulps.
  * NULL propagates identically (the rewritten comparison sees the
  * same NULL child); x is structurally non-negative (a SquaredL2, or
  * a self dot-product), so the x-side precondition is guaranteed by
  * construction rather than assumed. Only FINITE non-negative literal
  * radii rewrite; NaN/∞/negative radii keep the original predicate
  * (always-false/always-true edges are not worth the case analysis).
  *
  * Injected by [[graft.GraftExtensions]] (builder path) and
  * `GraftExtensions.register` (live-session `extraOptimizations`).
  * SqrtCompareRewriteSpec pins bit-exact result parity on adversarial
  * boundary radii and asserts the sqrt is gone from the executed plan.
  */
object SqrtCompareRewrite extends Rule[LogicalPlan] {

  /** Structurally non-negative distance expressions. */
  private def nonNegSquared(e: Expression): Boolean = e match {
    case _: SquaredL2 => true
    case DotProduct(a, b) if a.semanticEquals(b) => true
    case _ => false
  }

  private def finiteNonNegLit(e: Expression): Option[Double] =
    if (e.foldable && e.dataType == DoubleType) {
      e.eval() match {
        case d: java.lang.Double
            if !d.isNaN && !d.isInfinite && d.doubleValue() >= 0.0 =>
          Some(d.doubleValue())
        case _ => None
      }
    } else None

  /** Largest non-negative double x with fl(sqrt(x)) <= r (strict=false)
    * or fl(sqrt(x)) < r (strict=true); None if no x qualifies. */
  private def maxBelow(r: Double, strict: Boolean): Option[Double] = {
    def ok(x: Double) = if (strict) math.sqrt(x) < r else math.sqrt(x) <= r
    if (!ok(0.0)) return None
    if (ok(Double.MaxValue)) return Some(Double.MaxValue)
    var lo = 0L
    var hi = java.lang.Double.doubleToLongBits(Double.MaxValue)
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (ok(java.lang.Double.longBitsToDouble(mid))) lo = mid else hi = mid
    }
    Some(java.lang.Double.longBitsToDouble(lo))
  }

  private def leT(x: Expression, t: Double) = LessThanOrEqual(x, Literal(t, DoubleType))
  private def gtT(x: Expression, t: Double) = GreaterThan(x, Literal(t, DoubleType))

  /** sqrt(x) cmp r rewritten against the exact threshold. `x <= -1.0`
    * is the canonical empty set (x >= 0 or NULL by construction, so it
    * is false for every present row and NULL for NULL — exactly the
    * original's semantics when no x qualifies). */
  private def rewrite(x: Expression, r: Double,
      strict: Boolean, keepBelow: Boolean): Expression =
    (maxBelow(r, strict), keepBelow) match {
      case (Some(t), true)  => leT(x, t)
      case (Some(t), false) => gtT(x, t)
      case (None, true)     => leT(x, -1.0)
      case (None, false)    => gtT(x, -1.0)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // sqrt(x) <= r  ⟺  x <= maxBelow(r, non-strict)
    case LessThanOrEqual(Sqrt(x), rl) if nonNegSquared(x) && finiteNonNegLit(rl).isDefined =>
      rewrite(x, finiteNonNegLit(rl).get, strict = false, keepBelow = true)
    // sqrt(x) < r  ⟺  x <= maxBelow(r, strict)
    case LessThan(Sqrt(x), rl) if nonNegSquared(x) && finiteNonNegLit(rl).isDefined =>
      rewrite(x, finiteNonNegLit(rl).get, strict = true, keepBelow = true)
    // sqrt(x) > r  ⟺  NOT(sqrt(x) <= r)  ⟺  x > maxBelow(r, non-strict)
    case GreaterThan(Sqrt(x), rl) if nonNegSquared(x) && finiteNonNegLit(rl).isDefined =>
      rewrite(x, finiteNonNegLit(rl).get, strict = false, keepBelow = false)
    // sqrt(x) >= r  ⟺  x > maxBelow(r, strict)
    case GreaterThanOrEqual(Sqrt(x), rl) if nonNegSquared(x) && finiteNonNegLit(rl).isDefined =>
      rewrite(x, finiteNonNegLit(rl).get, strict = true, keepBelow = false)
    // mirrored literal-first forms
    case GreaterThanOrEqual(rl, Sqrt(x)) if nonNegSquared(x) && finiteNonNegLit(rl).isDefined =>
      rewrite(x, finiteNonNegLit(rl).get, strict = false, keepBelow = true)
    case GreaterThan(rl, Sqrt(x)) if nonNegSquared(x) && finiteNonNegLit(rl).isDefined =>
      rewrite(x, finiteNonNegLit(rl).get, strict = true, keepBelow = true)
    case LessThan(rl, Sqrt(x)) if nonNegSquared(x) && finiteNonNegLit(rl).isDefined =>
      rewrite(x, finiteNonNegLit(rl).get, strict = false, keepBelow = false)
    case LessThanOrEqual(rl, Sqrt(x)) if nonNegSquared(x) && finiteNonNegLit(rl).isDefined =>
      rewrite(x, finiteNonNegLit(rl).get, strict = true, keepBelow = false)
  }
}
