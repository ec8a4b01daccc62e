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
  * component) as ARRAY<DOUBLE> — the PCA transform (Pca.transform)
  * without re-centering the vector per component. `comps` rows must
  * all have `mean.length` columns. */
case class ProjectVec(child: Expression, mean: Array[Double],
    comps: Array[Array[Double]]) extends FloatOrDoubleVecKernel {

  require(comps.forall(_.length == mean.length),
    s"$prettyName: component rows must match mean dim ${mean.length}")

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
      out(c) = s
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
         |  $out[$c] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ProjectVec =
    copy(child = c)
}
