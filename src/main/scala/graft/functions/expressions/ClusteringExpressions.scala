package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen kernels for the vector-vs-FITTED-CONSTANT hot loops
  * (k-means assignment, PCA projection).
  *
  * Why kernels: Spark's higher-order functions (`zip_with`,
  * `aggregate`, `transform`) are NEVER whole-stage-codegen'd — each
  * HOF in a projection drops the stage to interpreted eval and
  * allocates an intermediate array per call. The k-means assignment
  * evaluates k distances per row and the PCA transform k' projections
  * per row, so the HOF formulation re-centers the vector k' times and
  * boxes every lambda step; these expressions run one fused primitive
  * loop per row and stay inside WholeStageCodegen (the
  * Int8AdcSquaredL2 precedent, which measured the same HOF cliff on
  * the int8 scan).
  *
  * Bit-parity contract: arithmetic is ELEMENT-ORDER identical to the
  * HOF twins kept in Clustering/Pca (widen to double first, accumulate
  * left-to-right; fixed-point terms are floor(x + 0.5) of nonnegative
  * doubles — exactly HALF_UP there), pinned by ClusteringKernelSpec's
  * randomized equality properties and end-to-end by the q135/q142/
  * q141/q144 oracles/gates.
  */
abstract class FloatOrDoubleVecKernel extends UnaryExpression {
  override def nullIntolerant: Boolean = true

  protected def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.simpleString}")
  }

  @inline protected final def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** Java fragment reading element `i` of ArrayData var `v`. */
  protected final def elemJava(v: String, i: String): String =
    if (elemIsFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

/** Fixed-point squared L2 to a CONSTANT centroid:
  * `Σᵢ floor((xᵢ − cᵢ)²·10⁸ + ½)` as LONG — the k-means assignment
  * distance (Clustering.distFp), add-order free by integer summing. */
case class FixedPointSquaredL2Const(child: Expression, cent: Array[Double])
    extends FloatOrDoubleVecKernel {

  override def prettyName: String = "graft_fp_l2_const"
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != cent.length)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch: vec=$n centroid=${cent.length}")
    val isFloat = elemIsFloat
    var s = 0L; var i = 0
    while (i < n) {
      val d = elem(v, i, isFloat) - cent(i)
      s += math.floor(d * d * 1e8 + 0.5).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("fpL2Cent", cent, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $v.numElements();
         |if ($n != $cRef.length) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch: vec=" + $n + " centroid=" + $cRef.length);
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double d = ${elemJava(v, i)} - $cRef[$i];
         |  $acc += (long) java.lang.Math.floor(d * d * 1e8 + 0.5);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): FixedPointSquaredL2Const =
    copy(child = c)
}

/** All k' principal projections in ONE pass:
  * `out[c] = Σᵢ (xᵢ − meanᵢ)·comps[c][i]` (left-to-right per
  * component, ÷ `scales[c]` when whitening — the same dot-then-divide
  * as the HOF twin) as ARRAY<DOUBLE> — the PCA transform
  * (Pca.transform) without re-centering the vector per component.
  * `comps` rows must all have `mean.length` columns; `scales` is
  * empty (no whitening) or one divisor per component. */
case class ProjectVec(child: Expression, mean: Array[Double],
    comps: Array[Array[Double]], scales: Array[Double] = Array.empty)
    extends FloatOrDoubleVecKernel {

  require(comps.forall(_.length == mean.length),
    s"$prettyName: component rows must match mean dim ${mean.length}")
  require(scales.isEmpty || scales.length == comps.length,
    s"$prettyName: scales length ${scales.length} != components ${comps.length}")

  override def prettyName: String = "graft_project_vec"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != mean.length)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch: vec=$n mean=${mean.length}")
    val isFloat = elemIsFloat
    val centered = new Array[Double](n)
    var i = 0
    while (i < n) { centered(i) = elem(v, i, isFloat) - mean(i); i += 1 }
    val out = new Array[Double](comps.length)
    var c = 0
    while (c < comps.length) {
      val w = comps(c)
      var s = 0.0; i = 0
      while (i < n) { s += centered(i) * w(i); i += 1 }
      out(c) = if (scales.isEmpty) s else s / scales(c)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mRef = ctx.addReferenceObj("projMean", mean, "double[]")
      val wRef = ctx.addReferenceObj("projComps", comps, "double[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val cen = ctx.freshName("centered")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val s = ctx.freshName("s")
      val scaleExpr =
        if (scales.isEmpty) s"$s"
        else {
          val sRef = ctx.addReferenceObj("projScales", scales, "double[]")
          s"$s / $sRef[$c]"
        }
      s"""
         |int $n = $v.numElements();
         |if ($n != $mRef.length) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch: vec=" + $n + " mean=" + $mRef.length);
         |}
         |double[] $cen = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $cen[$i] = ${elemJava(v, i)} - $mRef[$i];
         |}
         |double[] $out = new double[$wRef.length];
         |for (int $c = 0; $c < $wRef.length; $c++) {
         |  double[] $w = $wRef[$c];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $cen[$i] * $w[$i]; }
         |  $out[$c] = $scaleExpr;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ProjectVec =
    copy(child = c)
}

/** Deterministic ±1 random-hyperplane sign table shared by the fused
  * [[SrpSignature]] kernel and its HOF twin's integer plane formula
  * (Similarity.srpSignatureHof): sign(b, j) for 1-BASED element index
  * j — the HOF builds j from `sequence(1, size)`. */
object SrpKernel {
  def signTable(nBits: Int, n: Int): Array[Array[Double]] = {
    val t = Array.ofDim[Double](nBits, n)
    var b = 0
    while (b < nBits) {
      var j = 1
      while (j <= n) {
        val x = (b + 7).toLong * 1000003L + j.toLong * 10007L
        val q = (x * x) % 1000000007L
        t(b)(j - 1) =
          if (((q * 48271L + x * 16807L) % 2147483647L) % 2L == 0L) 1.0 else -1.0
        j += 1
      }
      b += 1
    }
    t
  }
}

/** All `nBits` signed-random-projection bits in ONE pass:
  * bit b = [Σⱼ xⱼ·sign(b, j+1) > 0] packed into a LONG — the SRP
  * cosine sketch (Charikar 2002; Similarity.srpSignature). The HOF
  * formulation ran nBits separate zip_with+aggregate legs per row
  * (nBits intermediate arrays, interpreted); this accumulates all
  * bit dots element-outer, which keeps every per-bit fold in the
  * same ascending-j order — bit-identical to the HOF twin. */
case class SrpSignature(child: Expression, nBits: Int)
    extends FloatOrDoubleVecKernel {

  // 64-bit signatures serve the wide near-dup tier (16-bit pigeonhole
  // blocks at web scale); the plane formula's integer mix stays far
  // inside Long range for b < 64 and any realistic dim
  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1, 64], got $nBits")

  override def prettyName: String = "graft_srp_signature"
  override def dataType: DataType = LongType

  // sign table sized to the widest vector seen by this instance
  @transient private var signs: Array[Array[Double]] = _

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (signs == null || signs(0).length < n) signs = SrpKernel.signTable(nBits, n)
    val isFloat = elemIsFloat
    val acc = new Array[Double](nBits)
    var j = 0
    while (j < n) {
      val xd = elem(v, j, isFloat)
      var b = 0
      while (b < nBits) { acc(b) += xd * signs(b)(j); b += 1 }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) { if (acc(b) > 0.0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val signsVar = ctx.addMutableState("double[][]", "srpSigns")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val xd = ctx.freshName("xd")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $v.numElements();
         |if ($signsVar == null || $signsVar[0].length < $n) {
         |  $signsVar = graft.functions.expressions.SrpKernel.signTable($nBits, $n);
         |}
         |double[] $acc = new double[$nBits];
         |for (int $j = 0; $j < $n; $j++) {
         |  double $xd = ${elemJava(v, j)};
         |  for (int $b = 0; $b < $nBits; $b++) { $acc[$b] += $xd * $signsVar[$b][$j]; }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  if ($acc[$b] > 0.0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SrpSignature =
    copy(child = c)
}
