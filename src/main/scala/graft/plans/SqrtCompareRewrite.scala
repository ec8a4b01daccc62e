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
  *
  * Since round 11 the rule also rewrites COSINE range/threshold
  * predicates (`graft_cosine_dist(a,b) <= r`,
  * `graft_cosine_sim(a,b) >= s`) to a division-free, sqrt-free
  * dot-form — see the cosine-tier section below for the two-stage
  * contract (bit-exact dist→sim bisection; real-arithmetic-exact
  * sim→dot squaring with a sign guard). CosineCompareRewriteSpec pins
  * parity and the sqrt/divide-free executed plan; q177/q178 pin the
  * SEMANTICS through the DuckDB gate with the rule active.
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

  // ------------------------------------------------------ cosine tier
  //
  // Range/threshold predicates over the repo's ONE cosine shape
  //
  //   sim  = coalesce(try_divide(dot(a,b), sqrt(dot(a,a))·sqrt(dot(b,b))), 0)
  //   dist = 1.0 - sim
  //
  // rewritten to a DOT-FORM comparison with no per-row division and no
  // per-row sqrt:
  //
  //   sim >= S   ⟺   d > 0  ∧  d·d >= S²·dot(a,a)·dot(b,b)    (S > 0)
  //
  // in TWO stages. Stage 1 (dist → sim threshold) is BIT-EXACT, the
  // sqrt tier's bisection trick transplanted: fl(1.0 − s) is monotone
  // non-increasing in s, so `fl(1.0−s) cmp r` is equivalent to
  // `s ≷ S` for a threshold S found by monotone bisection over the
  // double lattice — for EVERY double s, boundary ulps included.
  // Stage 2 (sim threshold → dot form) is exact in REAL arithmetic
  // (squaring both sides of d ≷ S·‖a‖‖b‖ with the sign guard) but not
  // in floating point: a row whose cosine sits within ~1 ulp of the
  // threshold can classify differently than the unrewritten plan —
  // which is itself an fl approximation of the real predicate, so
  // neither answer is "truer"; callers needing the unrewritten fl
  // boundary bit-for-bit should compare against a non-literal radius.
  // Zero-norm rows keep the coalesce contract exactly: a zero vector
  // zeroes dot(a,b) too, and every branch below maps that case to the
  // original's `0 cmp S`. NULL propagates identically (every leg of
  // the rewritten And/Or derives from the same null inputs, so
  // three-valued logic agrees). Guards: finite literal threshold,
  // deterministic children, no 0-valued literal norm factor; NaN
  // vector elements and |values| ≥ ~1e150 (where d·d overflows) are
  // outside the contract, as documented for the sqrt tier.

  /** The structural cosine-similarity match: returns (dot(a,b),
    * self-dot norm² factors, literal norm factor). The denominator may
    * carry ONE side constant-folded (a literal query vector's norm
    * folds before this batch runs); each surviving sqrt factor must be
    * the self-dot of one of dot(a,b)'s own children — that coupling is
    * what guarantees `denominator = 0 ⟹ d = 0`, which the zero-norm
    * branches rely on. */
  private object CosineSimShape {
    private def isZeroLit(e: Expression): Boolean = e match {
      case Literal(d: java.lang.Double, DoubleType) => d.doubleValue() == 0.0
      case _ => false
    }
    private def posLit(e: Expression): Option[Double] =
      finiteNonNegLit(e).filter(_ > 0.0)
    /** A denominator factor: a sqrt'd self-dot over one of d's
      * children, or a positive finite literal. */
    private def factor(e: Expression, d: DotProduct)
        : Option[scala.util.Either[Expression, Double]] = e match {
      case Sqrt(sd @ DotProduct(x1, x2))
          if x1.semanticEquals(x2) &&
            (x1.semanticEquals(d.left) || x1.semanticEquals(d.right)) =>
        Some(scala.util.Left(sd))
      case _ => posLit(e).map(scala.util.Right(_))
    }
    def unapply(e: Expression): Option[(Expression, Seq[Expression], Double)] =
      e match {
        // the third Divide field is version-shaped (EvalMode in 4.0,
        // NumericEvalContext in 4.1) — guard on the .evalMode accessor
        case Coalesce(Seq(
            div @ Divide(d: DotProduct, Multiply(f1, f2, _), _), z))
            if div.evalMode == EvalMode.TRY && isZeroLit(z) && e.deterministic =>
          (factor(f1, d), factor(f2, d)) match {
            case (Some(a), Some(b)) =>
              val dots = Seq(a, b).collect { case scala.util.Left(x) => x }
              val lits = Seq(a, b).collect { case scala.util.Right(v) => v }
              // at least one non-literal factor (both-literal folds the
              // whole sim to `d / const` — a different, rarer shape)
              if (dots.nonEmpty) Some((d, dots, lits.product)) else None
            case _ => None
          }
        case _ => None
      }
  }

  /** `1.0 - sim` — the cosine DISTANCE shape. */
  private object CosineDistShape {
    def unapply(e: Expression): Option[(Expression, Seq[Expression], Double)] =
      e match {
        case Subtract(Literal(one: java.lang.Double, DoubleType),
            CosineSimShape(d, dots, litF), _) if one.doubleValue() == 1.0 =>
          Some((d, dots, litF))
        case _ => None
      }
  }

  private def finiteLit(e: Expression): Option[Double] =
    if (e.foldable && e.dataType == DoubleType) {
      e.eval() match {
        case d: java.lang.Double if !d.isNaN && !d.isInfinite =>
          Some(d.doubleValue())
        case _ => None
      }
    } else None

  /** Monotone double→long order isomorphism (for lattice bisection
    * over BOTH signs — the sqrt tier only needed x ≥ 0). */
  private def ord(x: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(x)
    if (b >= 0) b else -(b & Long.MaxValue) - 1
  }
  private def unord(o: Long): Double =
    java.lang.Double.longBitsToDouble(if (o >= 0) o else (-(o + 1)) | Long.MinValue)

  /** Smallest finite double s with p(s), for UPWARD-CLOSED p (here
    * always `fl(1.0 − s) cmp r`, upward-closed because fl(1−s) is
    * monotone non-increasing); None if no finite s satisfies. */
  private def minSat(p: Double => Boolean): Option[Double] = {
    if (!p(Double.MaxValue)) return None
    if (p(-Double.MaxValue)) return Some(-Double.MaxValue)
    var lo = ord(-Double.MaxValue)
    var hi = ord(Double.MaxValue)
    while (hi - lo > 1 || hi - lo < 0) {
      // hi−lo spans > Long.MaxValue when the bounds straddle zero —
      // the wrapped difference is still the correct UNSIGNED distance,
      // so the logical-shift halving keeps the midpoint in range
      val mid = lo + ((hi - lo) >>> 1)
      if (p(unord(mid))) hi = mid else lo = mid
    }
    Some(unord(hi))
  }

  private val zeroD = Literal(0.0, DoubleType)
  private def mul(a: Expression, b: Expression) =
    Multiply(a, b, EvalMode.LEGACY) // doubles: LEGACY ≡ ANSI, never throws

  /** Dot-form of `sim cmpKind S` over (d, selfDots, litF). cmpKind:
    * 0 = `>=`, 1 = `>`, 2 = `<=`, 3 = `<` (2/3 are exact three-valued
    * negations of 1/0, so every branch below pairs with its dual). */
  private def simCmp(d: Expression, dots: Seq[Expression], litF: Double,
      cmpKind: Int, s: Double): Expression = {
    val c = s * litF // plan-time fold; one rounding, see contract above
    val prod = dots.reduce(mul)
    val rhs = mul(Literal(c * c, DoubleType), prod)
    val d2 = mul(d, d)
    cmpKind match {
      case 0 => // sim >= S  ⟺  d >= c·n
        if (c > 0) And(GreaterThan(d, zeroD), GreaterThanOrEqual(d2, rhs))
        else if (c == 0) GreaterThanOrEqual(d, zeroD)
        else Or(GreaterThanOrEqual(d, zeroD), LessThanOrEqual(d2, rhs))
      case 1 => // sim > S
        if (c > 0) And(GreaterThan(d, zeroD), GreaterThan(d2, rhs))
        else if (c == 0) GreaterThan(d, zeroD)
        else Or(GreaterThanOrEqual(d, zeroD), LessThan(d2, rhs))
      case 2 => // sim <= S  =  ¬(sim > S)
        if (c > 0) Or(LessThanOrEqual(d, zeroD), LessThanOrEqual(d2, rhs))
        else if (c == 0) LessThanOrEqual(d, zeroD)
        else And(LessThan(d, zeroD), GreaterThanOrEqual(d2, rhs))
      case _ => // sim < S  =  ¬(sim >= S)
        if (c > 0) Or(LessThanOrEqual(d, zeroD), LessThan(d2, rhs))
        else if (c == 0) LessThan(d, zeroD)
        else And(LessThan(d, zeroD), GreaterThan(d2, rhs))
    }
  }

  /** `dist cmpKind r` (cmpKind as in [[simCmp]]) → sim-threshold form
    * via the bit-exact bisection, then dot form. None (no rewrite) on
    * the degenerate no-finite-threshold edge. */
  private def distCmp(d: Expression, dots: Seq[Expression], litF: Double,
      cmpKind: Int, r: Double): Option[Expression] = cmpKind match {
    case 0 => // dist >= r  ⟺  ¬(dist < r)  ⟺  sim < min{s: fl(1−s) < r}
      minSat(s => 1.0 - s < r).map(simCmp(d, dots, litF, 3, _))
    case 1 => // dist > r  ⟺  sim < min{s: fl(1−s) <= r}
      minSat(s => 1.0 - s <= r).map(simCmp(d, dots, litF, 3, _))
    case 2 => // dist <= r  ⟺  sim >= min{s: fl(1−s) <= r}
      minSat(s => 1.0 - s <= r).map(simCmp(d, dots, litF, 0, _))
    case _ => // dist < r  ⟺  sim >= min{s: fl(1−s) < r}
      minSat(s => 1.0 - s < r).map(simCmp(d, dots, litF, 0, _))
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

    // ---- cosine DISTANCE vs literal radius (graft_cosine_dist cmp r)
    case orig @ GreaterThanOrEqual(CosineDistShape(d, n, f), rl)
        if finiteLit(rl).isDefined =>
      distCmp(d, n, f, 0, finiteLit(rl).get).getOrElse(orig)
    case orig @ GreaterThan(CosineDistShape(d, n, f), rl)
        if finiteLit(rl).isDefined =>
      distCmp(d, n, f, 1, finiteLit(rl).get).getOrElse(orig)
    case orig @ LessThanOrEqual(CosineDistShape(d, n, f), rl)
        if finiteLit(rl).isDefined =>
      distCmp(d, n, f, 2, finiteLit(rl).get).getOrElse(orig)
    case orig @ LessThan(CosineDistShape(d, n, f), rl)
        if finiteLit(rl).isDefined =>
      distCmp(d, n, f, 3, finiteLit(rl).get).getOrElse(orig)
    // mirrored literal-first forms (r cmp dist)
    case orig @ LessThanOrEqual(rl, CosineDistShape(d, n, f))
        if finiteLit(rl).isDefined =>
      distCmp(d, n, f, 0, finiteLit(rl).get).getOrElse(orig)
    case orig @ LessThan(rl, CosineDistShape(d, n, f))
        if finiteLit(rl).isDefined =>
      distCmp(d, n, f, 1, finiteLit(rl).get).getOrElse(orig)
    case orig @ GreaterThanOrEqual(rl, CosineDistShape(d, n, f))
        if finiteLit(rl).isDefined =>
      distCmp(d, n, f, 2, finiteLit(rl).get).getOrElse(orig)
    case orig @ GreaterThan(rl, CosineDistShape(d, n, f))
        if finiteLit(rl).isDefined =>
      distCmp(d, n, f, 3, finiteLit(rl).get).getOrElse(orig)

    // ---- cosine SIMILARITY vs literal threshold (graft_cosine_sim cmp s)
    case GreaterThanOrEqual(CosineSimShape(d, n, f), sl)
        if finiteLit(sl).isDefined =>
      simCmp(d, n, f, 0, finiteLit(sl).get)
    case GreaterThan(CosineSimShape(d, n, f), sl) if finiteLit(sl).isDefined =>
      simCmp(d, n, f, 1, finiteLit(sl).get)
    case LessThanOrEqual(CosineSimShape(d, n, f), sl) if finiteLit(sl).isDefined =>
      simCmp(d, n, f, 2, finiteLit(sl).get)
    case LessThan(CosineSimShape(d, n, f), sl) if finiteLit(sl).isDefined =>
      simCmp(d, n, f, 3, finiteLit(sl).get)
    // mirrored literal-first forms (s cmp sim)
    case LessThanOrEqual(sl, CosineSimShape(d, n, f)) if finiteLit(sl).isDefined =>
      simCmp(d, n, f, 0, finiteLit(sl).get)
    case LessThan(sl, CosineSimShape(d, n, f)) if finiteLit(sl).isDefined =>
      simCmp(d, n, f, 1, finiteLit(sl).get)
    case GreaterThanOrEqual(sl, CosineSimShape(d, n, f)) if finiteLit(sl).isDefined =>
      simCmp(d, n, f, 2, finiteLit(sl).get)
    case GreaterThan(sl, CosineSimShape(d, n, f)) if finiteLit(sl).isDefined =>
      simCmp(d, n, f, 3, finiteLit(sl).get)
  }
}
