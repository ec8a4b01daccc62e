package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** IEEE 754 half-precision (binary16) scalar conversions, shared by the
  * interpreted and generated code paths. Round-to-nearest-even on
  * encode, exact on decode (every half value is a float value).
  *
  * Spark has no 2-byte float type, so eltype="Float16" indexes
  * (reference parametric type, /root/reference/src/LMDiskANN.jl:239
  * `T=Float16`, tolerance tests test/runtests.jl:552-638) pack vectors
  * into a BINARY column — 2 bytes per component on disk, exactly the
  * reference's storage footprint — and decode to Float32 for compute. */
object Half {

  /** Float32 → binary16 bits (round-to-nearest-even), in [0, 0xffff]. */
  def floatToHalfBits(f: Float): Int = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val abs = bits & 0x7fffffff
    if (abs >= 0x7f800000) {
      // Inf / NaN
      if (abs > 0x7f800000) sign | 0x7e00 else sign | 0x7c00
    } else if (abs >= 0x477ff000) {
      // rounds to >= 2^16 -> Inf (max finite half is 65504; 65520+ overflows)
      sign | 0x7c00
    } else if (abs < 0x33000000) {
      // below half the smallest subnormal (2^-25) -> signed zero
      sign
    } else if (abs < 0x38800000) {
      // subnormal half: mantissa = value / 2^-24, shifted with RNE
      val e = abs >>> 23
      val m = (abs & 0x7fffff) | 0x800000
      val shift = 126 - e // in [14, 24]
      val shifted = m >>> shift
      val rem = m & ((1 << shift) - 1)
      val mid = 1 << (shift - 1)
      val rounded =
        if (rem > mid || (rem == mid && (shifted & 1) == 1)) shifted + 1 else shifted
      sign | rounded
    } else {
      // normal: rebias exponent, keep top 10 mantissa bits with RNE
      // (a mantissa carry correctly bumps the exponent field)
      val e = abs >>> 23
      val m = abs & 0x7fffff
      val shifted = m >>> 13
      val rem = m & 0x1fff
      var out = ((e - 112) << 10) | shifted
      if (rem > 0x1000 || (rem == 0x1000 && (shifted & 1) == 1)) out += 1
      sign | out
    }
  }

  /** binary16 bits → Float32 (exact). */
  def halfBitsToFloat(h: Int): Float = {
    val neg = (h & 0x8000) != 0
    val exp = (h >>> 10) & 0x1f
    val mant = h & 0x3ff
    val mag =
      if (exp == 31) { if (mant != 0) Float.NaN else Float.PositiveInfinity }
      else if (exp == 0) java.lang.Math.scalb(mant.toFloat, -24)
      else java.lang.Math.scalb((0x400 | mant).toFloat, exp - 25)
    if (neg) -mag else mag
  }
}

/** ARRAY<FLOAT> → BINARY: little-endian binary16 packing (2 bytes per
  * component). Codegen'd — stays inside WholeStageCodegen on the index
  * write path. */
case class FloatArrayToHalf(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_to_half"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val h = Half.floatToHalfBits(a.getFloat(i))
      out(i * 2) = h.toByte
      out(i * 2 + 1) = (h >>> 8).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n * 2];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $h = graft.functions.expressions.Half.floatToHalfBits($a.getFloat($i));
         |  $out[$i * 2] = (byte) $h;
         |  $out[$i * 2 + 1] = (byte) ($h >>> 8);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): FloatArrayToHalf = copy(c)
}

/** BINARY (little-endian binary16 packing) → ARRAY<FLOAT>. Codegen'd;
  * emits an UnsafeArrayData straight from the primitive float array. */
case class HalfToFloatArray(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_from_half"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val h = (b(i * 2) & 0xff) | ((b(i * 2 + 1) & 0xff) << 8)
      out(i) = Half.halfBitsToFloat(h)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $b.length / 2;
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $h = ($b[$i * 2] & 0xff) | (($b[$i * 2 + 1] & 0xff) << 8);
         |  $out[$i] = graft.functions.expressions.Half.halfBitsToFloat($h);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HalfToFloatArray = copy(c)
}
