package graft.plans

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.expressions.DotProduct

/** ScalaCheck properties for the cosine dot-form rewrite — pure
  * expression-level evaluation (no Spark jobs), so the space of
  * (vector, threshold, comparator) cases explored per run is far
  * larger than the DataFrame spec's. Away from the fl boundary the
  * rewritten predicate must agree EXACTLY with the unrewritten tree on
  * every case, including zero-norm vectors and negative similarities.
  */
object CosineRewriteProps extends Properties("SqrtCompareRewrite.cosine") {

  // small-int float components: exact fl values, frequent ties,
  // deliberate zero vectors
  private val vecGen: Gen[Array[Float]] = for {
    d <- Gen.choose(1, 5)
    zero <- Gen.frequency(9 -> false, 1 -> true)
    xs <- Gen.listOfN(d, Gen.chooseNum(-8, 8).map(_.toFloat / 2.0f))
  } yield if (zero) Array.fill(d)(0.0f) else xs.toArray

  private def arrLit(v: Array[Float]): Expression =
    Literal.create(v, ArrayType(FloatType, containsNull = false))

  private def simTree(a: Expression, b: Expression): Expression =
    Coalesce(Seq(
      Divide(DotProduct(a, b),
        Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))),
        EvalMode.TRY),
      Literal(0.0, DoubleType)))

  private def distTree(a: Expression, b: Expression): Expression =
    Subtract(Literal(1.0, DoubleType), simTree(a, b))

  /** Run the optimizer rule over a Filter wrapping `pred` and return
    * the (possibly rewritten) condition. */
  private def rewrite(pred: Expression): Expression =
    SqrtCompareRewrite(Filter(pred, LocalRelation(Nil))) match {
      case f: Filter => f.condition
      case other => sys.error(s"unexpected plan $other")
    }

  private def evalB(e: Expression): Option[Boolean] =
    Option(e.eval(null)).map(_.asInstanceOf[Boolean])

  private val cmps: Seq[(Expression, Expression) => Expression] = Seq(
    LessThanOrEqual(_, _), LessThan(_, _), GreaterThan(_, _), GreaterThanOrEqual(_, _))

  private val caseGen = for {
    a <- vecGen
    b <- vecGen.map(_.take(a.length)).suchThat(_.length == a.length)
    cmpIdx <- Gen.choose(0, 3)
    r <- Gen.chooseNum(-0.5, 2.5)
  } yield (a, b, cmpIdx, r)

  private def flSim(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    val n = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    if (n == 0.0) 0.0 else dot(a, b) / n
  }

  property("dist-form parity off the ulp boundary (all comparators)") =
    Prop.forAll(caseGen) { case (a, b, cmpIdx, r) =>
      val dist = 1.0 - flSim(a, b)
      // stage 2 is real-exact, not fl-exact: skip radii within a hair
      // of the achieved distance (the documented contract)
      if (math.abs(dist - r) < 1e-9) Prop.passed
      else {
        val orig = cmps(cmpIdx)(distTree(arrLit(a), arrLit(b)), Literal(r, DoubleType))
        val re = rewrite(orig)
        val changed = re ne orig
        Prop.collect(if (changed) "rewritten" else "kept") {
          changed && (evalB(orig) == evalB(re))
        }
      }
    }

  property("sim-form parity off the ulp boundary (all comparators + mirrored)") =
    Prop.forAll(caseGen) { case (a, b, cmpIdx, s) =>
      val sim = flSim(a, b)
      val t = s - 1.0 // map the radius gen to thresholds in [-1.5, 1.5]
      if (math.abs(sim - t) < 1e-9) Prop.passed
      else Prop.propBoolean {
        val thr = Literal(t, DoubleType)
        val st = simTree(arrLit(a), arrLit(b))
        val orig = cmps(cmpIdx)(st, thr)
        val mirrored = cmps(cmpIdx)(thr, st)
        val reO = rewrite(orig)
        val reM = rewrite(mirrored)
        (reO ne orig) && (reM ne mirrored) &&
          evalB(orig) == evalB(reO) && evalB(mirrored) == evalB(reM)
      }
    }

  property("rewritten tree carries no Sqrt and no Divide") =
    Prop.forAll(caseGen) { case (a, b, cmpIdx, r) =>
      val re = rewrite(
        cmps(cmpIdx)(distTree(arrLit(a), arrLit(b)), Literal(r, DoubleType)))
      !re.exists(e => e.isInstanceOf[Sqrt] || e.isInstanceOf[Divide])
    }
}
