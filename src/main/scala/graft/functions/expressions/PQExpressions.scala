package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native product-quantization kernels.
  *
  * LM-DiskANN's defining idea is a low-memory node layout: the record
  * of a node carries COMPRESSED representations of its neighborhood so
  * search never needs the full-precision vectors resident in RAM
  * (reference `/root/reference/paper/paper.md:23` — pan2023lm; the
  * Julia package realizes "low memory" via mmap, a single-node device;
  * the Spark-native equivalent of "don't keep full vectors hot" is a
  * PQ code column that is ~30x smaller than the vector column, so the
  * scan side of a distance pass reads 1/30th the bytes).
  *
  * Layouts (flat, row-major):
  *  - codebook: float[m * k * subDim], centroid (j, c) at
  *    `(j*k + c) * subDim`.
  *  - LUT: float[m * k], partial squared-L2 of a query's j-th
  *    subvector against centroid (j, c) at `j*k + c`.
  *
  * Both kernels stay inside WholeStageCodegen; the codebook/LUT ride
  * along as codegen reference objects (plain float[]), not literals in
  * the generated source.
  */
case class PQEncode(child: Expression, codebook: Array[Float], m: Int, k: Int)
    extends UnaryExpression {
  private val subDim = codebook.length / (m * k)

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if k > 256 =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be <= 256 (byte codes)")
    case ArrayType(FloatType, _) if codebook.length % (m * k) != 0 =>
      // subDim comes from integer division, so a bare == m*k*subDim
      // check passes trivially on a truncated codebook — test
      // divisibility explicitly to catch a mis-sized one
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: codebook length ${codebook.length} is not divisible by m*k (${m * k})")
    case ArrayType(FloatType, _) if codebook.length == 0 =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName: empty codebook")
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  /** Encode one vector: per subspace, the index of the nearest
    * centroid (squared L2), stored as an unsigned byte. */
  private[expressions] def encode(v: ArrayData): Array[Byte] = {
    if (v.numElements() != m * subDim) {
      throw new IllegalArgumentException(
        s"$prettyName: vector dimension ${v.numElements()} != m*subDim (${m * subDim})")
    }
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (j * k + c) * subDim
        var d = 0.0; var s = 0
        while (s < subDim) {
          val diff = v.getFloat(j * subDim + s).toDouble - codebook(base + s).toDouble
          d += diff * diff
          s += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(encode(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d"); val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dimension " + $v.numElements() + " != ${m * subDim}");
         |}
         |byte[] $codes = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $base = ($j * $k + $c) * $subDim;
         |    double $d = 0.0;
         |    for (int $s = 0; $s < $subDim; $s++) {
         |      double diff = (double) $v.getFloat($j * $subDim + $s) - (double) $cb[$base + $s];
         |      $d += diff * diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$j] = (byte) $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PQEncode =
    copy(child = newChild)
}

/** Asymmetric-distance computation: approximate squared L2 between the
  * (uncompressed) query behind `lut` and the vector behind `codes` —
  * `sum_j lut[j*k + codes[j]]`. The LUT is built once per query on the
  * driver (m*k*subDim work) and amortized over every code row, so the
  * per-row cost is m lookups instead of a full d-dimensional pass. */
case class PQAdc(left: Expression, right: Expression, k: Int) extends BinaryExpression {
  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<TINYINT> codes, ARRAY<FLOAT> lut), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  private[expressions] def adc(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * k) {
      throw new IllegalArgumentException(
        s"$prettyName: LUT length ${lut.numElements()} != m*k (${m * k})")
    }
    var sum = 0.0; var j = 0
    while (j < m) {
      sum += lut.getFloat(j * k + (codes.getByte(j) & 0xFF)).toDouble
      j += 1
    }
    sum
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m"); val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |if ($lut.numElements() != $m * $k) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: LUT length " + $lut.numElements() + " != " + ($m * $k));
         |}
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += (double) $lut.getFloat($j * $k + (((int) $codes.getByte($j)) & 0xFF));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PQAdc =
    copy(left = l, right = r)
}
